/* Stub of pxr/imaging/hd/changeTracker.h (see pxr/pxr.h header note). */
#pragma once

#include <string>

#include <pxr/base/tf/token.h>
#include <pxr/imaging/hd/types.h>
#include <pxr/usd/sdf/path.h>
#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

class HdChangeTracker {
  public:
    enum RprimDirtyBits : HdDirtyBits {
        Clean = 0,
        InitRepr = 1 << 0,
        Varying = 1 << 1,
        AllDirty = ~Varying,
        DirtyPrimID = 1 << 2,
        DirtyExtent = 1 << 3,
        DirtyDisplayStyle = 1 << 4,
        DirtyPoints = 1 << 5,
        DirtyPrimvar = 1 << 6,
        DirtyMaterialId = 1 << 7,
        DirtyTopology = 1 << 8,
        DirtyTransform = 1 << 9,
        DirtyVisibility = 1 << 10,
        DirtyNormals = 1 << 11,
        DirtyDoubleSided = 1 << 12,
        DirtyCullStyle = 1 << 13,
        DirtySubdivTags = 1 << 14,
        DirtyWidths = 1 << 15,
        DirtyInstancer = 1 << 16,
        DirtyInstanceIndex = 1 << 17,
        DirtyRepr = 1 << 18,
        DirtyRenderTag = 1 << 19,
        DirtyComputationPrimvarDesc = 1 << 20,
        DirtyCategories = 1 << 21,
        DirtyVolumeField = 1 << 22,
        AllSceneDirtyBits = ((1 << 23) - 1),
    };

    static bool IsClean(HdDirtyBits bits) { return bits == Clean; }
    static bool IsDirty(HdDirtyBits bits) { return bits != Clean; }
    static bool IsTransformDirty(HdDirtyBits bits, const SdfPath&) {
        return bits & DirtyTransform;
    }
    static bool IsVisibilityDirty(HdDirtyBits bits, const SdfPath&) {
        return bits & DirtyVisibility;
    }
    static bool IsInstancerDirty(HdDirtyBits bits, const SdfPath&) {
        return bits & DirtyInstancer;
    }
    static bool IsTopologyDirty(HdDirtyBits bits, const SdfPath&) {
        return bits & DirtyTopology;
    }
    static bool IsAnyPrimvarDirty(HdDirtyBits bits, const SdfPath&) {
        return bits & (DirtyPoints | DirtyPrimvar | DirtyNormals |
                       DirtyWidths);
    }
    static bool IsPrimvarDirty(HdDirtyBits bits, const SdfPath&,
                               const TfToken& name) {
        (void)name;
        return bits & (DirtyPoints | DirtyPrimvar | DirtyNormals |
                       DirtyWidths);
    }
    static std::string StringifyDirtyBits(HdDirtyBits bits) {
        return std::to_string(bits);
    }
};

PXR_NAMESPACE_CLOSE_SCOPE
