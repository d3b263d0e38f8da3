/* Stub of pxr/base/gf/matrix4d.h (see pxr/pxr.h header note). */
#pragma once

#include <pxr/base/gf/vec4f.h>
#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

class GfMatrix4d {
  public:
    GfMatrix4d() {
        for (int i = 0; i < 4; ++i)
            for (int j = 0; j < 4; ++j) _m[i][j] = i == j ? 1.0 : 0.0;
    }
    double* operator[](int i) { return _m[i]; }
    const double* operator[](int i) const { return _m[i]; }
    GfMatrix4d operator*(const GfMatrix4d& o) const {
        GfMatrix4d r;
        for (int i = 0; i < 4; ++i)
            for (int j = 0; j < 4; ++j) {
                double s = 0.0;
                for (int k = 0; k < 4; ++k) s += _m[i][k] * o._m[k][j];
                r._m[i][j] = s;
            }
        return r;
    }

  private:
    double _m[4][4];
};

PXR_NAMESPACE_CLOSE_SCOPE
