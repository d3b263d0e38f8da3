/* Mesh Rprim adapter: triangulation/primvars/instancer product delegate
 * to hydra_core; parity target reference hydra/mesh.{hpp,cpp}. */

#pragma once

#include <optional>
#include <vector>

#include <pxr/imaging/hd/mesh.h>

#include "../moonshine_tpu.h"
#include "hydra_core.hpp"
#include "renderDelegate.hpp"

PXR_NAMESPACE_OPEN_SCOPE

class HdMoonshineTpuMesh final : public HdMesh {
  public:
    HdMoonshineTpuMesh(SdfPath const& id,
                       const HdMoonshineTpuRenderParam& renderParam);

    HdDirtyBits GetInitialDirtyBitsMask() const override;
    void Sync(HdSceneDelegate* sceneDelegate, HdRenderParam* renderParam,
              HdDirtyBits* dirtyBits, TfToken const& reprToken) override;
    void Finalize(HdRenderParam* renderParam) override;

  protected:
    HdDirtyBits _PropagateDirtyBits(HdDirtyBits bits) const override;
    void _InitRepr(TfToken const& reprToken,
                   HdDirtyBits* dirtyBits) override;

  private:
    std::optional<HdInterpolation> _FindPrimvarInterpolation(
        HdSceneDelegate* sceneDelegate, TfToken name) const;

    MsnMeshHandle _mesh = 0;
    MsnMaterialHandle _material = 0;
    msnh::Mat4 _transform = msnh::Mat4::Identity();
    std::vector<msnh::Mat4> _instanceTransforms;
    msnh::InstancedMesh _instances;
};

PXR_NAMESPACE_CLOSE_SCOPE
