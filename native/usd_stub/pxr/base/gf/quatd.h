/* Stub of pxr/base/gf/quatd.h (see pxr/pxr.h header note). */
#pragma once

#include <pxr/base/gf/vec3d.h>
#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

class GfQuatd {
  public:
    GfQuatd() : _real(1.0) {}
    GfQuatd(double real, const GfVec3d& imaginary)
        : _real(real), _imag(imaginary) {}

    double GetReal() const { return _real; }
    const GfVec3d& GetImaginary() const { return _imag; }

  private:
    double _real;
    GfVec3d _imag;
};

PXR_NAMESPACE_CLOSE_SCOPE
