/* See renderBuffer.hpp. */

#include "renderBuffer.hpp"

#include <pxr/base/gf/vec3i.h>

#include "renderDelegate.hpp"

PXR_NAMESPACE_OPEN_SCOPE

HdMoonshineTpuRenderBuffer::HdMoonshineTpuRenderBuffer(
    SdfPath const& id, HdMoonshineTpuRenderDelegate* delegate)
    : HdRenderBuffer(id), _delegate(delegate) {}

HdMoonshineTpuRenderBuffer::~HdMoonshineTpuRenderBuffer() = default;

bool HdMoonshineTpuRenderBuffer::Allocate(GfVec3i const& dimensions,
                                          HdFormat, bool) {
    _width = dimensions[0];
    _height = dimensions[1];
    _sensor = MsnCreateSensor(_delegate->engine(),
                              MsnExtent2D{_width, _height});
    /* USD reads pixels straight out of the engine's persistent readback
     * buffer — MsnRender refreshes it in place */
    _data = MsnGetSensorData(_delegate->engine(), _sensor);
    return true;
}

PXR_NAMESPACE_CLOSE_SCOPE
