/* Stub of pxr/imaging/hd/instancer.h (see pxr/pxr.h header note). */
#pragma once

#include <pxr/imaging/hd/sceneDelegate.h>
#include <pxr/imaging/hd/types.h>
#include <pxr/usd/sdf/path.h>
#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

class HdRenderIndex;
class HdRenderParam;

class HdInstancer {
  public:
    HdInstancer(HdSceneDelegate* delegate, SdfPath const& id)
        : _delegate(delegate), _id(id) {}
    virtual ~HdInstancer() = default;

    SdfPath const& GetId() const { return _id; }
    SdfPath const& GetParentId() const { return _parentId; }
    HdSceneDelegate* GetDelegate() const { return _delegate; }

    virtual void Sync(HdSceneDelegate* sceneDelegate,
                      HdRenderParam* renderParam, HdDirtyBits* dirtyBits) {}
    virtual void Finalize(HdRenderParam* renderParam) {}
    virtual HdDirtyBits GetInitialDirtyBitsMask() const { return ~0u; }

    static void _SyncInstancerAndParents(HdRenderIndex& renderIndex,
                                         SdfPath const& instancerId) {
        (void)renderIndex;
        (void)instancerId;
    }

  protected:
    void _UpdateInstancer(HdSceneDelegate* delegate,
                          HdDirtyBits* dirtyBits) {
        (void)delegate;
        (void)dirtyBits;
    }

  private:
    HdSceneDelegate* _delegate;
    SdfPath _id;
    SdfPath _parentId;
};

PXR_NAMESPACE_CLOSE_SCOPE
