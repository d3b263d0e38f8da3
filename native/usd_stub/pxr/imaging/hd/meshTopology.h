/* Stub of pxr/imaging/hd/meshTopology.h (see pxr/pxr.h header note). */
#pragma once

#include <pxr/base/tf/token.h>
#include <pxr/base/vt/array.h>
#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

/* hd/types.h in real USD defines HdTupleType; it is only name-referenced
 * here for the ext-computation descriptor. */
struct HdTupleType {
    int type = 0;
    size_t count = 0;
};

class HdMeshTopology {
  public:
    HdMeshTopology() = default;
    HdMeshTopology(TfToken const& scheme, TfToken const& orientation,
                   VtIntArray const& faceVertexCounts,
                   VtIntArray const& faceVertexIndices)
        : _counts(faceVertexCounts), _indices(faceVertexIndices) {}

    const VtIntArray& GetFaceVertexCounts() const { return _counts; }
    const VtIntArray& GetFaceVertexIndices() const { return _indices; }
    int GetNumFaces() const { return static_cast<int>(_counts.size()); }

  private:
    VtIntArray _counts;
    VtIntArray _indices;
};

PXR_NAMESPACE_CLOSE_SCOPE
