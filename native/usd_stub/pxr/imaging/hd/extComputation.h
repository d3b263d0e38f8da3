/* Stub of pxr/imaging/hd/extComputation.h (see pxr/pxr.h header note). */
#pragma once

#include <pxr/imaging/hd/rprim.h>
#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

class HdExtComputation : public HdSprim {
  public:
    explicit HdExtComputation(SdfPath const& id) : HdSprim(id) {}

    void Sync(HdSceneDelegate* delegate, HdRenderParam* renderParam,
              HdDirtyBits* dirtyBits) override {
        (void)delegate;
        (void)renderParam;
        if (dirtyBits) *dirtyBits = 0;
    }
    HdDirtyBits GetInitialDirtyBitsMask() const override { return ~0u; }
};

PXR_NAMESPACE_CLOSE_SCOPE
