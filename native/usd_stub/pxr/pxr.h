/* Minimal USD API surface for compiling the hdMoonshineTpu adapters
 * without a USD distribution (this environment has no USD and no network
 * egress — see native/Makefile `hydra-syntax`).
 *
 * These headers are NOT OpenUSD sources: they are stub declarations
 * written against the documented OpenUSD 24.x API (class names, virtual
 * signatures, token tables) with trivial inline bodies. Their only job is
 * to let g++ type-check the adapter layer (mesh.cpp, material.cpp, ...)
 * the same way real pxr headers would: a wrong override signature, a
 * misspelled member, or a bad include path fails this build exactly as it
 * would fail against real USD.
 *
 * Parity target: the reference builds its delegate against real USD
 * (reference build.zig:112-185); when a USD_ROOT is available the
 * Makefile `hydra` target ignores this directory entirely. */

#pragma once

#define PXR_NAMESPACE_OPEN_SCOPE namespace pxr {
#define PXR_NAMESPACE_CLOSE_SCOPE }
#define PXR_NAMESPACE_USING_DIRECTIVE using namespace pxr;

namespace pxr {}
