/* Stub of pxr/imaging/hd/camera.h (see pxr/pxr.h header note). */
#pragma once

#include <pxr/base/gf/matrix4d.h>
#include <pxr/imaging/hd/rprim.h>
#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

class HdCamera : public HdSprim {
  public:
    explicit HdCamera(SdfPath const& id) : HdSprim(id) {}

    void Sync(HdSceneDelegate* delegate, HdRenderParam* renderParam,
              HdDirtyBits* dirtyBits) override {
        (void)renderParam;
        if (delegate) _transform = delegate->GetTransform(GetId());
        if (dirtyBits) *dirtyBits = 0;
    }
    HdDirtyBits GetInitialDirtyBitsMask() const override { return ~0u; }

    GfMatrix4d const& GetTransform() const { return _transform; }
    float GetHorizontalAperture() const { return _horizontalAperture; }
    float GetVerticalAperture() const { return _verticalAperture; }
    float GetFocalLength() const { return _focalLength; }
    float GetFStop() const { return _fStop; }
    float GetFocusDistance() const { return _focusDistance; }

  protected:
    GfMatrix4d _transform;
    float _horizontalAperture = 20.955f;
    float _verticalAperture = 15.2908f;
    float _focalLength = 50.0f;
    float _fStop = 0.0f;
    float _focusDistance = 0.0f;
};

PXR_NAMESPACE_CLOSE_SCOPE
