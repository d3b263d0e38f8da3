/* Stub of pxr/usd/sdr/shaderProperty.h (see pxr/pxr.h header note). */
#pragma once

#include <pxr/base/tf/token.h>
#include <pxr/base/vt/value.h>
#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

class SdrShaderProperty {
  public:
    virtual ~SdrShaderProperty() = default;

    const TfToken& GetName() const { return _name; }
    const VtValue& GetDefaultValue() const { return _defaultValue; }
    const TfToken& GetType() const { return _type; }

  private:
    TfToken _name;
    TfToken _type;
    VtValue _defaultValue;
};

using SdrShaderPropertyConstPtr = const SdrShaderProperty*;

PXR_NAMESPACE_CLOSE_SCOPE
