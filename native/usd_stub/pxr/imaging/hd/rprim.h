/* Stub of pxr/imaging/hd/rprim.h + sprim.h + bprim.h
 * (see pxr/pxr.h header note). */
#pragma once

#include <pxr/base/tf/token.h>
#include <pxr/imaging/hd/changeTracker.h>
#include <pxr/imaging/hd/sceneDelegate.h>
#include <pxr/imaging/hd/types.h>
#include <pxr/usd/sdf/path.h>
#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

class HdRenderParam;

class HdRprim {
  public:
    explicit HdRprim(SdfPath const& id) : _id(id) {}
    virtual ~HdRprim() = default;

    virtual void Sync(HdSceneDelegate* delegate,
                      HdRenderParam* renderParam, HdDirtyBits* dirtyBits,
                      TfToken const& reprToken) = 0;
    virtual void Finalize(HdRenderParam* renderParam) {}
    virtual HdDirtyBits GetInitialDirtyBitsMask() const = 0;

    SdfPath const& GetId() const { return _id; }
    SdfPath const& GetInstancerId() const { return _instancerId; }
    SdfPath const& GetMaterialId() const { return _materialId; }
    bool IsVisible() const { return _visible; }

    HdPrimvarDescriptorVector GetPrimvarDescriptors(
        HdSceneDelegate* delegate, HdInterpolation interpolation) const {
        return delegate->GetPrimvarDescriptors(GetId(), interpolation);
    }

  protected:
    virtual HdDirtyBits _PropagateDirtyBits(HdDirtyBits bits) const = 0;
    virtual void _InitRepr(TfToken const& reprToken,
                           HdDirtyBits* dirtyBits) = 0;

    void _UpdateVisibility(HdSceneDelegate* delegate,
                           HdDirtyBits* dirtyBits) {
        if (HdChangeTracker::IsVisibilityDirty(*dirtyBits, GetId()))
            _visible = delegate->GetVisible(GetId());
    }
    void _UpdateInstancer(HdSceneDelegate* delegate,
                          HdDirtyBits* dirtyBits) {
        (void)delegate;
        (void)dirtyBits;
    }

  private:
    SdfPath _id;
    SdfPath _instancerId;
    SdfPath _materialId;
    bool _visible = true;
};

class HdSprim {
  public:
    explicit HdSprim(SdfPath const& id) : _id(id) {}
    virtual ~HdSprim() = default;

    virtual void Sync(HdSceneDelegate* delegate,
                      HdRenderParam* renderParam,
                      HdDirtyBits* dirtyBits) = 0;
    virtual HdDirtyBits GetInitialDirtyBitsMask() const = 0;
    virtual void Finalize(HdRenderParam* renderParam) {}

    SdfPath const& GetId() const { return _id; }

  private:
    SdfPath _id;
};

class HdBprim {
  public:
    explicit HdBprim(SdfPath const& id) : _id(id) {}
    virtual ~HdBprim() = default;

    virtual void Sync(HdSceneDelegate* delegate,
                      HdRenderParam* renderParam, HdDirtyBits* dirtyBits) {}
    virtual HdDirtyBits GetInitialDirtyBitsMask() const { return 0; }
    virtual void Finalize(HdRenderParam* renderParam) {}

    SdfPath const& GetId() const { return _id; }

  private:
    SdfPath _id;
};

PXR_NAMESPACE_CLOSE_SCOPE
