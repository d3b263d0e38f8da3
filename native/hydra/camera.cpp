/* See camera.hpp. */

#include "camera.hpp"

#include <pxr/base/gf/matrix4d.h>

#include "hydra_core.hpp"
#include "renderDelegate.hpp"

PXR_NAMESPACE_OPEN_SCOPE

HdMoonshineTpuCamera::HdMoonshineTpuCamera(SdfPath const& id)
    : HdCamera(id) {}

void HdMoonshineTpuCamera::Sync(HdSceneDelegate* sceneDelegate,
                                HdRenderParam* renderParam,
                                HdDirtyBits* dirtyBits) {
    HdCamera::Sync(sceneDelegate, renderParam, dirtyBits);
    MsnEngine* engine =
        static_cast<HdMoonshineTpuRenderParam*>(renderParam)->engine;

    const GfMatrix4d t = GetTransform();
    msnh::Mat4 m;
    for (int i = 0; i < 4; ++i)
        for (int j = 0; j < 4; ++j) m.m[i][j] = t[i][j];

    const MsnLens lens = msnh::LensFromCamera(
        m, GetVerticalAperture(), GetFocalLength());

    if (_handle == static_cast<MsnLensHandle>(-1)) {
        _handle = MsnCreateLens(engine, lens);
    } else {
        MsnSetLens(engine, _handle, lens);
    }
}

PXR_NAMESPACE_CLOSE_SCOPE
