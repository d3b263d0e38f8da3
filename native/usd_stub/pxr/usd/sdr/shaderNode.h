/* Stub of pxr/usd/sdr/shaderNode.h (see pxr/pxr.h header note). */
#pragma once

#include <string>
#include <vector>

#include <pxr/base/tf/token.h>
#include <pxr/usd/sdr/shaderProperty.h>
#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

using NdrTokenVec = std::vector<TfToken>;

/* SdrNodeRole public tokens (sdr/shaderNode.h SDR_NODE_ROLE_TOKENS;
 * capitalized members, lowercase string values — the spelling the
 * reference delegate compiles against). */
struct SdrNodeRoleType {
    TfToken Primvar{"primvar"};
    TfToken Texture{"texture"};
    TfToken Math{"math"};
    TfToken Field{"field"};
    const SdrNodeRoleType* operator->() const { return this; }
};
inline const SdrNodeRoleType SdrNodeRole;

class SdrShaderNode {
  public:
    virtual ~SdrShaderNode() = default;

    const NdrTokenVec& GetInputNames() const { return _inputNames; }
    const NdrTokenVec& GetOutputNames() const { return _outputNames; }
    std::string GetRole() const { return _role; }
    NdrTokenVec GetAssetIdentifierInputNames() const { return {}; }
    SdrShaderPropertyConstPtr GetShaderInput(
        const TfToken& inputName) const {
        (void)inputName;
        return nullptr;
    }
    SdrShaderPropertyConstPtr GetShaderOutput(
        const TfToken& outputName) const {
        (void)outputName;
        return nullptr;
    }

  private:
    NdrTokenVec _inputNames;
    NdrTokenVec _outputNames;
    std::string _role;
};

using SdrShaderNodeConstPtr = const SdrShaderNode*;

PXR_NAMESPACE_CLOSE_SCOPE
