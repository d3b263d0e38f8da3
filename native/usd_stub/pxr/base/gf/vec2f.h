/* Stub of pxr/base/gf vector types (see pxr/pxr.h header note). */
#pragma once

#include <type_traits>

#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

template <typename T, int N>
class Gf_StubVec {
  public:
    Gf_StubVec() : _d{} {}
    explicit Gf_StubVec(T fill) {
        for (int i = 0; i < N; ++i) _d[i] = fill;
    }
    Gf_StubVec(T x, T y) : _d{x, y} { static_assert(N == 2, "arity"); }
    template <int M = N, typename = typename std::enable_if<M == 3>::type>
    Gf_StubVec(T x, T y, T z) : _d{x, y, z} {}
    template <int M = N, typename = typename std::enable_if<M == 4>::type>
    Gf_StubVec(T x, T y, T z, T w) : _d{x, y, z, w} {}

    T& operator[](int i) { return _d[i]; }
    const T& operator[](int i) const { return _d[i]; }
    const T* data() const { return _d; }
    bool operator==(const Gf_StubVec& o) const {
        for (int i = 0; i < N; ++i)
            if (_d[i] != o._d[i]) return false;
        return true;
    }

  private:
    T _d[N];
};

using GfVec2f = Gf_StubVec<float, 2>;
using GfVec3f = Gf_StubVec<float, 3>;
using GfVec4f = Gf_StubVec<float, 4>;
using GfVec2d = Gf_StubVec<double, 2>;
using GfVec3d = Gf_StubVec<double, 3>;
using GfVec4d = Gf_StubVec<double, 4>;
using GfVec2i = Gf_StubVec<int, 2>;
using GfVec3i = Gf_StubVec<int, 3>;
using GfVec4i = Gf_StubVec<int, 4>;

PXR_NAMESPACE_CLOSE_SCOPE
