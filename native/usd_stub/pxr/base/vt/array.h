/* Stub of pxr/base/vt/array.h + types.h (see pxr/pxr.h header note). */
#pragma once

#include <vector>

#include <pxr/base/gf/matrix4d.h>
#include <pxr/base/gf/quatd.h>
#include <pxr/base/gf/vec2f.h>
#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

template <typename T>
class VtArray : public std::vector<T> {
  public:
    using std::vector<T>::vector;
    const T* cdata() const { return this->data(); }
};

using VtIntArray = VtArray<int>;
using VtFloatArray = VtArray<float>;
using VtVec2fArray = VtArray<GfVec2f>;
using VtVec3fArray = VtArray<GfVec3f>;
using VtVec4fArray = VtArray<GfVec4f>;
using VtVec3dArray = VtArray<GfVec3d>;
using VtQuatdArray = VtArray<GfQuatd>;
using VtMatrix4dArray = VtArray<GfMatrix4d>;

PXR_NAMESPACE_CLOSE_SCOPE
