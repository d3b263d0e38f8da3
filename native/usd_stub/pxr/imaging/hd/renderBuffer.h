/* Stub of pxr/imaging/hd/renderBuffer.h (see pxr/pxr.h header note). */
#pragma once

#include <pxr/base/gf/vec3i.h>
#include <pxr/imaging/hd/rprim.h>
#include <pxr/imaging/hd/types.h>
#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

class HdRenderBuffer : public HdBprim {
  public:
    explicit HdRenderBuffer(SdfPath const& id) : HdBprim(id) {}

    void Sync(HdSceneDelegate* delegate, HdRenderParam* renderParam,
              HdDirtyBits* dirtyBits) override {
        (void)delegate;
        (void)renderParam;
        if (dirtyBits) *dirtyBits = 0;
    }
    HdDirtyBits GetInitialDirtyBitsMask() const override { return ~0u; }
    void Finalize(HdRenderParam* renderParam) override {
        (void)renderParam;
    }

    virtual bool Allocate(GfVec3i const& dimensions, HdFormat format,
                          bool multiSampled) = 0;
    virtual unsigned int GetWidth() const = 0;
    virtual unsigned int GetHeight() const = 0;
    virtual unsigned int GetDepth() const = 0;
    virtual HdFormat GetFormat() const = 0;
    virtual bool IsMultiSampled() const = 0;
    virtual void* Map() = 0;
    virtual void Unmap() = 0;
    virtual bool IsMapped() const = 0;
    virtual void Resolve() = 0;
    virtual bool IsConverged() const = 0;

  protected:
    virtual void _Deallocate() = 0;
};

PXR_NAMESPACE_CLOSE_SCOPE
