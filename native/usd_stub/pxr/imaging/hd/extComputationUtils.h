/* Stub of pxr/imaging/hd/extComputationUtils.h
 * (see pxr/pxr.h header note). */
#pragma once

#include <unordered_map>

#include <pxr/base/tf/token.h>
#include <pxr/base/vt/value.h>
#include <pxr/imaging/hd/sceneDelegate.h>
#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

namespace HdExtComputationUtils {

using ValueStore =
    std::unordered_map<TfToken, VtValue, TfToken::HashFunctor>;

inline ValueStore GetComputedPrimvarValues(
    HdExtComputationPrimvarDescriptorVector const& compPrimvars,
    HdSceneDelegate* sceneDelegate) {
    (void)sceneDelegate;
    ValueStore out;
    for (auto const& pv : compPrimvars) out[pv.name] = VtValue();
    return out;
}

}  // namespace HdExtComputationUtils

PXR_NAMESPACE_CLOSE_SCOPE
