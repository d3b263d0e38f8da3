/* Stub of pxr/imaging/hd/renderPass.h + rprimCollection.h
 * (see pxr/pxr.h header note). */
#pragma once

#include <memory>

#include <pxr/base/tf/token.h>
#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

class HdRenderIndex;
class HdRenderPassState;
using HdRenderPassStateSharedPtr = std::shared_ptr<HdRenderPassState>;

class HdRprimCollection {
  public:
    HdRprimCollection() = default;

  private:
    TfToken _name;
};

class HdRenderPass {
  public:
    HdRenderPass(HdRenderIndex* index, HdRprimCollection const& collection)
        : _renderIndex(index), _collection(collection) {}
    virtual ~HdRenderPass() = default;

    HdRenderIndex* GetRenderIndex() const { return _renderIndex; }
    HdRprimCollection const& GetRprimCollection() const {
        return _collection;
    }

    void Execute(HdRenderPassStateSharedPtr const& renderPassState,
                 TfTokenVector const& renderTags) {
        _Execute(renderPassState, renderTags);
    }
    virtual bool IsConverged() const { return false; }

  protected:
    virtual void _Execute(HdRenderPassStateSharedPtr const& renderPassState,
                          TfTokenVector const& renderTags) = 0;
    virtual void _MarkCollectionDirty() {}

  private:
    HdRenderIndex* _renderIndex;
    HdRprimCollection _collection;
};

using HdRenderPassSharedPtr = std::shared_ptr<HdRenderPass>;

PXR_NAMESPACE_CLOSE_SCOPE
