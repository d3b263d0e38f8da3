/* Stub of pxr/imaging/hd/sceneDelegate.h (see pxr/pxr.h header note). */
#pragma once

#include <vector>

#include <pxr/base/gf/matrix4d.h>
#include <pxr/base/tf/token.h>
#include <pxr/base/vt/array.h>
#include <pxr/base/vt/value.h>
#include <pxr/imaging/hd/meshTopology.h>
#include <pxr/imaging/hd/renderIndex.h>
#include <pxr/imaging/hd/types.h>
#include <pxr/usd/sdf/path.h>
#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

class HdRenderIndex;

struct HdPrimvarDescriptor {
    HdPrimvarDescriptor() = default;
    HdPrimvarDescriptor(TfToken const& name_, HdInterpolation interp_,
                        TfToken const& role_ = TfToken(),
                        bool indexed_ = false)
        : name(name_), interpolation(interp_), role(role_),
          indexed(indexed_) {}
    TfToken name;
    HdInterpolation interpolation = HdInterpolationConstant;
    TfToken role;
    bool indexed = false;
};
using HdPrimvarDescriptorVector = std::vector<HdPrimvarDescriptor>;

struct HdExtComputationPrimvarDescriptor : public HdPrimvarDescriptor {
    SdfPath sourceComputationId;
    TfToken sourceComputationOutputName;
    HdTupleType valueType = {};
};
using HdExtComputationPrimvarDescriptorVector =
    std::vector<HdExtComputationPrimvarDescriptor>;

class HdSceneDelegate {
  public:
    HdSceneDelegate(HdRenderIndex* parentIndex, SdfPath const& delegateID)
        : _index(parentIndex), _id(delegateID) {}
    virtual ~HdSceneDelegate() = default;

    HdRenderIndex& GetRenderIndex() { return *_index; }
    SdfPath const& GetDelegateID() const { return _id; }

    virtual VtValue Get(SdfPath const& id, TfToken const& key) {
        return VtValue();
    }
    virtual GfMatrix4d GetTransform(SdfPath const& id) {
        return GfMatrix4d();
    }
    virtual bool GetVisible(SdfPath const& id) { return true; }
    virtual SdfPath GetMaterialId(SdfPath const& rprimId) {
        return SdfPath();
    }
    virtual VtValue GetMaterialResource(SdfPath const& materialId) {
        return VtValue();
    }
    virtual HdMeshTopology GetMeshTopology(SdfPath const& id) {
        return HdMeshTopology();
    }
    virtual HdPrimvarDescriptorVector GetPrimvarDescriptors(
        SdfPath const& id, HdInterpolation interpolation) {
        return {};
    }
    virtual HdExtComputationPrimvarDescriptorVector
    GetExtComputationPrimvarDescriptors(SdfPath const& id,
                                        HdInterpolation interpolation) {
        return {};
    }
    virtual GfMatrix4d GetInstancerTransform(SdfPath const& instancerId) {
        return GfMatrix4d();
    }
    virtual VtIntArray GetInstanceIndices(SdfPath const& instancerId,
                                          SdfPath const& prototypeId) {
        return {};
    }
    virtual SdfPathVector GetInstancerPrototypes(
        SdfPath const& instancerId) {
        return {};
    }

  private:
    HdRenderIndex* _index;
    SdfPath _id;
};

PXR_NAMESPACE_CLOSE_SCOPE
