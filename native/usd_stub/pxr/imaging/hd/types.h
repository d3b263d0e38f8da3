/* Stub of pxr/imaging/hd/types.h + enums.h (see pxr/pxr.h header note). */
#pragma once

#include <cstdint>

/* real hd headers reach tf/diagnostic.h transitively; adapters rely on
 * TF_CODING_ERROR without including it directly */
#include <pxr/base/tf/diagnostic.h>
#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

using HdDirtyBits = uint32_t;

enum HdFormat {
    HdFormatInvalid = -1,
    HdFormatUNorm8 = 0,
    HdFormatUNorm8Vec2,
    HdFormatUNorm8Vec3,
    HdFormatUNorm8Vec4,
    HdFormatSNorm8,
    HdFormatSNorm8Vec2,
    HdFormatSNorm8Vec3,
    HdFormatSNorm8Vec4,
    HdFormatFloat16,
    HdFormatFloat16Vec2,
    HdFormatFloat16Vec3,
    HdFormatFloat16Vec4,
    HdFormatFloat32,
    HdFormatFloat32Vec2,
    HdFormatFloat32Vec3,
    HdFormatFloat32Vec4,
    HdFormatInt16,
    HdFormatInt16Vec2,
    HdFormatInt16Vec3,
    HdFormatInt16Vec4,
    HdFormatUInt16,
    HdFormatUInt16Vec2,
    HdFormatUInt16Vec3,
    HdFormatUInt16Vec4,
    HdFormatInt32,
    HdFormatInt32Vec2,
    HdFormatInt32Vec3,
    HdFormatInt32Vec4,
    HdFormatFloat32UInt8,
    HdFormatCount
};

enum HdInterpolation {
    HdInterpolationConstant = 0,
    HdInterpolationUniform,
    HdInterpolationVarying,
    HdInterpolationVertex,
    HdInterpolationFaceVarying,
    HdInterpolationInstance,
    HdInterpolationCount
};

PXR_NAMESPACE_CLOSE_SCOPE
