/* See instancer.hpp. */

#include "instancer.hpp"

#include <pxr/base/gf/matrix4d.h>
#include <pxr/base/gf/quatd.h>
#include <pxr/base/gf/vec3d.h>
#include <pxr/imaging/hd/renderIndex.h>
#include <pxr/imaging/hd/sceneDelegate.h>
#include <pxr/imaging/hd/tokens.h>

PXR_NAMESPACE_OPEN_SCOPE

HdMoonshineTpuInstancer::HdMoonshineTpuInstancer(HdSceneDelegate* delegate,
                                                 SdfPath const& id)
    : HdInstancer(delegate, id) {}

void HdMoonshineTpuInstancer::Sync(HdSceneDelegate* delegate,
                                   HdRenderParam*,
                                   HdDirtyBits* dirtyBits) {
    _UpdateInstancer(delegate, dirtyBits);

    if (HdChangeTracker::IsAnyPrimvarDirty(*dirtyBits, GetId())) {
        SdfPath const& id = GetId();
        for (HdPrimvarDescriptor const& pv : delegate->GetPrimvarDescriptors(
                 id, HdInterpolationInstance)) {
            if (HdChangeTracker::IsPrimvarDirty(*dirtyBits, id, pv.name)) {
                VtValue value = delegate->Get(id, pv.name);
                if (!value.IsEmpty()) _primvars[pv.name] = value;
            }
        }
    }
}

static msnh::Mat4 FromGf(const GfMatrix4d& m) {
    msnh::Mat4 out;
    for (int i = 0; i < 4; ++i)
        for (int j = 0; j < 4; ++j) out.m[i][j] = m[i][j];
    return out;
}

std::vector<msnh::Mat4>
HdMoonshineTpuInstancer::ComputeInstanceTransforms(
    SdfPath const& prototypeId) {
    const GfMatrix4d instancerTransform =
        GetDelegate()->GetInstancerTransform(GetId());
    const VtIntArray indicesVt =
        GetDelegate()->GetInstanceIndices(GetId(), prototypeId);
    std::vector<int> indices(indicesVt.cbegin(), indicesVt.cend());

    msnh::InstancerPrimvars pv;
    auto grab = [&](TfToken name) { return _primvars[name]; };

    VtValue tv = grab(HdInstancerTokens->instanceTranslations);
    if (tv.CanCast<VtVec3dArray>()) {
        for (const GfVec3d& t :
             tv.Cast<VtVec3dArray>().UncheckedGet<VtVec3dArray>()) {
            pv.translations.insert(pv.translations.end(),
                                   {t[0], t[1], t[2]});
        }
    }
    VtValue rv = grab(HdInstancerTokens->instanceRotations);
    if (rv.CanCast<VtQuatdArray>()) {
        for (const GfQuatd& q :
             rv.Cast<VtQuatdArray>().UncheckedGet<VtQuatdArray>()) {
            const GfVec3d im = q.GetImaginary();
            pv.rotations.insert(pv.rotations.end(),
                                {q.GetReal(), im[0], im[1], im[2]});
        }
    }
    VtValue sv = grab(HdInstancerTokens->instanceScales);
    if (sv.CanCast<VtVec3dArray>()) {
        for (const GfVec3d& s :
             sv.Cast<VtVec3dArray>().UncheckedGet<VtVec3dArray>()) {
            pv.scales.insert(pv.scales.end(), {s[0], s[1], s[2]});
        }
    }
    VtValue xv = grab(HdInstancerTokens->instanceTransforms);
    if (xv.CanCast<VtMatrix4dArray>()) {
        for (const GfMatrix4d& m :
             xv.Cast<VtMatrix4dArray>().UncheckedGet<VtMatrix4dArray>()) {
            pv.transforms.push_back(FromGf(m));
        }
    }

    std::vector<msnh::Mat4> transforms = msnh::ComposeInstanceTransforms(
        FromGf(instancerTransform), indices, pv);

    if (GetParentId().IsEmpty()) return transforms;

    auto* parent = static_cast<HdMoonshineTpuInstancer*>(
        GetDelegate()->GetRenderIndex().GetInstancer(GetParentId()));
    return msnh::NestedProduct(parent->ComputeInstanceTransforms(GetId()),
                               transforms);
}

PXR_NAMESPACE_CLOSE_SCOPE
