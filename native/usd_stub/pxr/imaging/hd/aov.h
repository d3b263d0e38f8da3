/* Stub of pxr/imaging/hd/aov.h (see pxr/pxr.h header note). */
#pragma once

#include <vector>

#include <pxr/base/tf/token.h>
#include <pxr/base/vt/value.h>
#include <pxr/imaging/hd/types.h>
#include <pxr/usd/sdf/path.h>
#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

class HdRenderBuffer;

struct HdAovDescriptor {
    HdAovDescriptor() = default;
    HdAovDescriptor(HdFormat format_, bool multiSampled_,
                    VtValue const& clearValue_)
        : format(format_), multiSampled(multiSampled_),
          clearValue(clearValue_) {}

    HdFormat format = HdFormatInvalid;
    bool multiSampled = false;
    VtValue clearValue;
};

struct HdRenderPassAovBinding {
    TfToken aovName;
    HdRenderBuffer* renderBuffer = nullptr;
    SdfPath renderBufferId;
    VtValue clearValue;
    HdAovDescriptor aovSettings;
};
using HdRenderPassAovBindingVector = std::vector<HdRenderPassAovBinding>;

PXR_NAMESPACE_CLOSE_SCOPE
