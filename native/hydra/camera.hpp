/* Camera Sprim adapter: transform + aperture/focal -> engine lens via
 * msnh::LensFromCamera; parity target reference hydra/camera.{hpp,cpp}. */

#pragma once

#include <pxr/imaging/hd/camera.h>

#include "../moonshine_tpu.h"

PXR_NAMESPACE_OPEN_SCOPE

class HdMoonshineTpuCamera final : public HdCamera {
  public:
    explicit HdMoonshineTpuCamera(SdfPath const& id);

    void Sync(HdSceneDelegate* sceneDelegate, HdRenderParam* renderParam,
              HdDirtyBits* dirtyBits) override;

    MsnLensHandle handle() const { return _handle; }

  private:
    MsnLensHandle _handle = static_cast<MsnLensHandle>(-1);
};

PXR_NAMESPACE_CLOSE_SCOPE
