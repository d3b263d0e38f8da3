/* Render-buffer Bprim: a sensor-backed color AOV mapped directly onto the
 * engine's persistent RGBA f32 readback buffer; parity target reference
 * hydra/renderBuffer.{hpp,cpp}. */

#pragma once

#include <cstdint>

#include <pxr/imaging/hd/renderBuffer.h>

#include "../moonshine_tpu.h"

PXR_NAMESPACE_OPEN_SCOPE

class HdMoonshineTpuRenderDelegate;

class HdMoonshineTpuRenderBuffer final : public HdRenderBuffer {
  public:
    HdMoonshineTpuRenderBuffer(SdfPath const& id,
                               HdMoonshineTpuRenderDelegate* delegate);
    ~HdMoonshineTpuRenderBuffer() override;

    bool Allocate(GfVec3i const& dimensions, HdFormat format,
                  bool multiSampled) override;

    unsigned int GetWidth() const override { return _width; }
    unsigned int GetHeight() const override { return _height; }
    unsigned int GetDepth() const override { return 1; }
    HdFormat GetFormat() const override { return HdFormatFloat32Vec4; }
    bool IsMultiSampled() const override { return false; }

    void* Map() override { return _data; }
    void Unmap() override {}
    bool IsMapped() const override { return false; }
    bool IsConverged() const override { return false; }
    void Resolve() override {}

    MsnSensorHandle sensor() const { return _sensor; }

  private:
    void _Deallocate() override {}

    HdMoonshineTpuRenderDelegate* _delegate;
    MsnSensorHandle _sensor = 0;
    float* _data = nullptr;
    unsigned int _width = 0;
    unsigned int _height = 0;
};

PXR_NAMESPACE_CLOSE_SCOPE
