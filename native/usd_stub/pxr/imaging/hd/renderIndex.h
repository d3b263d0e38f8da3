/* Stub of pxr/imaging/hd/renderIndex.h (see pxr/pxr.h header note). */
#pragma once

#include <pxr/base/tf/token.h>
#include <pxr/imaging/hd/changeTracker.h>
#include <pxr/usd/sdf/path.h>
#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

class HdRenderDelegate;
class HdSprim;
class HdBprim;
class HdRprim;
class HdInstancer;

class HdRenderIndex {
  public:
    HdRenderDelegate* GetRenderDelegate() const { return _delegate; }
    HdChangeTracker& GetChangeTracker() { return _tracker; }
    HdSprim* GetSprim(TfToken const& typeId, SdfPath const& id) const {
        (void)typeId;
        (void)id;
        return nullptr;
    }
    HdBprim* GetBprim(TfToken const& typeId, SdfPath const& id) const {
        (void)typeId;
        (void)id;
        return nullptr;
    }
    HdRprim const* GetRprim(SdfPath const& id) const {
        (void)id;
        return nullptr;
    }
    HdInstancer* GetInstancer(SdfPath const& id) const {
        (void)id;
        return nullptr;
    }

  private:
    HdRenderDelegate* _delegate = nullptr;
    HdChangeTracker _tracker;
};

PXR_NAMESPACE_CLOSE_SCOPE
