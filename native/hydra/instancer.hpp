/* Point-instancer adapter: primvar capture here, transform math in
 * hydra_core (ComposeInstanceTransforms / NestedProduct); parity target
 * reference hydra/instancer.{hpp,cpp}. */

#pragma once

#include <unordered_map>
#include <vector>

#include <pxr/base/vt/value.h>
#include <pxr/imaging/hd/instancer.h>

#include "hydra_core.hpp"

PXR_NAMESPACE_OPEN_SCOPE

class HdMoonshineTpuInstancer final : public HdInstancer {
  public:
    HdMoonshineTpuInstancer(HdSceneDelegate* delegate, SdfPath const& id);

    void Sync(HdSceneDelegate* delegate, HdRenderParam* renderParam,
              HdDirtyBits* dirtyBits) override;

    std::vector<msnh::Mat4> ComputeInstanceTransforms(
        SdfPath const& prototypeId);

  private:
    std::unordered_map<TfToken, VtValue, TfToken::HashFunctor> _primvars;
};

PXR_NAMESPACE_CLOSE_SCOPE
