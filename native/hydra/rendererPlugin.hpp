/* Plugin registration (hdMoonshineTpu.so entry point); parity target
 * reference hydra/rendererPlugin.{hpp,cpp}. */

#pragma once

#include <pxr/imaging/hd/rendererPlugin.h>

PXR_NAMESPACE_OPEN_SCOPE

class HdMoonshineTpuPlugin final : public HdRendererPlugin {
  public:
    HdMoonshineTpuPlugin() = default;

    HdRenderDelegate* CreateRenderDelegate() override;
    HdRenderDelegate* CreateRenderDelegate(
        HdRenderSettingsMap const& settingsMap) override;
    void DeleteRenderDelegate(HdRenderDelegate* renderDelegate) override;
    bool IsSupported(bool gpuEnabled = true) const override;

  private:
    HdMoonshineTpuPlugin(const HdMoonshineTpuPlugin&) = delete;
    HdMoonshineTpuPlugin& operator=(const HdMoonshineTpuPlugin&) = delete;
};

PXR_NAMESPACE_CLOSE_SCOPE
