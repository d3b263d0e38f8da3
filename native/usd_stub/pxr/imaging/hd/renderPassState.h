/* Stub of pxr/imaging/hd/renderPassState.h (see pxr/pxr.h header note). */
#pragma once

#include <pxr/imaging/hd/aov.h>
#include <pxr/imaging/hd/camera.h>
#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

class HdRenderPassState {
  public:
    HdRenderPassState() = default;
    virtual ~HdRenderPassState() = default;

    const HdCamera* GetCamera() const { return _camera; }
    HdRenderPassAovBindingVector const& GetAovBindings() const {
        return _aovBindings;
    }

  protected:
    const HdCamera* _camera = nullptr;
    HdRenderPassAovBindingVector _aovBindings;
};

PXR_NAMESPACE_CLOSE_SCOPE
