/* Stub of pxr/imaging/hd/material.h (see pxr/pxr.h header note):
 * HdMaterial Sprim + the HdMaterialNetwork/Network2 graph types and
 * HdConvertToHdMaterialNetwork2, with real USD member spellings. */
#pragma once

#include <map>
#include <vector>

#include <pxr/base/tf/token.h>
#include <pxr/base/vt/value.h>
#include <pxr/imaging/hd/rprim.h>
#include <pxr/imaging/hd/tokens.h>
#include <pxr/usd/sdf/path.h>
#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

class HdMaterial : public HdSprim {
  public:
    enum DirtyBits : HdDirtyBits {
        Clean = 0,
        DirtyParams = 1 << 0,
        DirtyResource = 1 << 1,
        AllDirty = DirtyParams | DirtyResource,
    };

  protected:
    explicit HdMaterial(SdfPath const& id) : HdSprim(id) {}
};

struct HdMaterialNode {
    SdfPath path;
    TfToken identifier;
    std::map<TfToken, VtValue> parameters;
};

struct HdMaterialRelationship {
    SdfPath inputId;
    TfToken inputName;
    SdfPath outputId;
    TfToken outputName;
};

struct HdMaterialNetwork {
    std::vector<HdMaterialRelationship> relationships;
    std::vector<HdMaterialNode> nodes;
    TfTokenVector primvars;
};

struct HdMaterialNetworkMap {
    std::map<TfToken, HdMaterialNetwork> map;
    std::vector<SdfPath> terminals;
};

struct HdMaterialConnection2 {
    SdfPath upstreamNode;
    TfToken upstreamOutputName;
};

struct HdMaterialNode2 {
    TfToken nodeTypeId;
    std::map<TfToken, VtValue> parameters;
    std::map<TfToken, std::vector<HdMaterialConnection2>> inputConnections;
};

struct HdMaterialNetwork2 {
    std::map<SdfPath, HdMaterialNode2> nodes;
    std::map<TfToken, HdMaterialConnection2> terminals;
    TfTokenVector primvars;
};

inline HdMaterialNetwork2 HdConvertToHdMaterialNetwork2(
    const HdMaterialNetworkMap& hdNetworkMap, bool* isVolume = nullptr) {
    (void)hdNetworkMap;
    if (isVolume) *isVolume = false;
    return HdMaterialNetwork2();
}

PXR_NAMESPACE_CLOSE_SCOPE
