/* Material Sprim adapter: UsdPreviewSurface network -> engine material
 * via msnh::ApplyPreviewSurfaceParam; parity target reference
 * hydra/material.{hpp,cpp}. */

#pragma once

#include <pxr/imaging/hd/material.h>

#include "../moonshine_tpu.h"
#include "renderDelegate.hpp"

PXR_NAMESPACE_OPEN_SCOPE

class HdMoonshineTpuMaterial final : public HdMaterial {
  public:
    HdMoonshineTpuMaterial(const SdfPath& id,
                           const HdMoonshineTpuRenderParam& renderParam);

    void Sync(HdSceneDelegate* sceneDelegate, HdRenderParam* renderParam,
              HdDirtyBits* dirtyBits) override;
    HdDirtyBits GetInitialDirtyBitsMask() const override;

    MsnMaterialHandle handle() const { return _handle; }

  private:
    MsnMaterialHandle _handle;
};

PXR_NAMESPACE_CLOSE_SCOPE
