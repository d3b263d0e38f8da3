/* Stub of pxr/imaging/hd/rendererPlugin.h (see pxr/pxr.h header note). */
#pragma once

#include <pxr/imaging/hd/renderDelegate.h>
#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

class HdRendererPlugin {
  public:
    virtual HdRenderDelegate* CreateRenderDelegate() = 0;
    virtual HdRenderDelegate* CreateRenderDelegate(
        HdRenderSettingsMap const& settingsMap) {
        (void)settingsMap;
        return nullptr;
    }
    virtual void DeleteRenderDelegate(HdRenderDelegate* renderDelegate) = 0;
    virtual bool IsSupported(bool gpuEnabled = true) const = 0;

  protected:
    HdRendererPlugin() = default;
    virtual ~HdRendererPlugin() = default;
};

PXR_NAMESPACE_CLOSE_SCOPE
