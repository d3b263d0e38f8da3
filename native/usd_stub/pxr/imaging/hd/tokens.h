/* Stub of pxr/imaging/hd/tokens.h (see pxr/pxr.h header note): the token
 * tables the adapters read, with real USD spellings. */
#pragma once

#include <pxr/base/tf/staticTokens.h>
#include <pxr/base/tf/token.h>
#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

#define _MSN_HD_TOKEN_STRUCT_BEGIN(name) \
    struct name##Type {                  \
        const name##Type* operator->() const { return this; }
#define _MSN_HD_TOKEN_STRUCT_END(name) \
    }                                  \
    ;                                  \
    inline const name##Type name;

_MSN_HD_TOKEN_STRUCT_BEGIN(HdTokens)
TfToken points{"points"};
TfToken normals{"normals"};
TfToken widths{"widths"};
TfToken velocities{"velocities"};
TfToken displayColor{"displayColor"};
TfToken transform{"transform"};
_MSN_HD_TOKEN_STRUCT_END(HdTokens)

_MSN_HD_TOKEN_STRUCT_BEGIN(HdPrimTypeTokens)
TfToken mesh{"mesh"};
TfToken basisCurves{"basisCurves"};
TfToken points{"points"};
TfToken volume{"volume"};
TfToken camera{"camera"};
TfToken material{"material"};
TfToken light{"light"};
TfToken domeLight{"domeLight"};
TfToken extComputation{"extComputation"};
TfToken renderBuffer{"renderBuffer"};
TfToken renderSettings{"renderSettings"};
TfToken instancer{"instancer"};
_MSN_HD_TOKEN_STRUCT_END(HdPrimTypeTokens)

_MSN_HD_TOKEN_STRUCT_BEGIN(HdAovTokens)
TfToken color{"color"};
TfToken depth{"depth"};
TfToken normal{"normal"};
TfToken primId{"primId"};
TfToken instanceId{"instanceId"};
_MSN_HD_TOKEN_STRUCT_END(HdAovTokens)

/* USD 23.11+ spellings (instance* prefix); the pre-23.11 names are kept
 * too so either vintage of adapter code type-checks. */
_MSN_HD_TOKEN_STRUCT_BEGIN(HdInstancerTokens)
TfToken instanceTranslations{"instanceTranslations"};
TfToken instanceRotations{"instanceRotations"};
TfToken instanceScales{"instanceScales"};
TfToken instanceTransforms{"instanceTransforms"};
TfToken translate{"translate"};
TfToken rotate{"rotate"};
TfToken scale{"scale"};
TfToken instanceTransform{"instanceTransform"};
_MSN_HD_TOKEN_STRUCT_END(HdInstancerTokens)

_MSN_HD_TOKEN_STRUCT_BEGIN(HdMaterialTerminalTokens)
TfToken surface{"surface"};
TfToken displacement{"displacement"};
TfToken volume{"volume"};
_MSN_HD_TOKEN_STRUCT_END(HdMaterialTerminalTokens)

#undef _MSN_HD_TOKEN_STRUCT_BEGIN
#undef _MSN_HD_TOKEN_STRUCT_END

PXR_NAMESPACE_CLOSE_SCOPE
