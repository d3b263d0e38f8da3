/* Stub of pxr/usd/sdr/registry.h (see pxr/pxr.h header note). */
#pragma once

#include <pxr/base/tf/token.h>
#include <pxr/usd/sdr/shaderNode.h>
#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

class SdrRegistry {
  public:
    static SdrRegistry& GetInstance() {
        static SdrRegistry instance;
        return instance;
    }

    SdrShaderNodeConstPtr GetShaderNodeByIdentifier(
        const TfToken& identifier) {
        (void)identifier;
        return nullptr;
    }
    SdrShaderNodeConstPtr GetShaderNodeByIdentifierAndType(
        const TfToken& identifier, const TfToken& nodeType) {
        (void)identifier;
        (void)nodeType;
        return nullptr;
    }

  private:
    SdrRegistry() = default;
};

PXR_NAMESPACE_CLOSE_SCOPE
