/* Stub of pxr/base/tf/diagnostic.h (see pxr/pxr.h header note). */
#pragma once

#include <cstdio>

#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

/* printf-style so format/argument mismatches in adapter code are
 * diagnosed exactly as real TF_CODING_ERROR (which is printf-checked). */
#if defined(__GNUC__)
__attribute__((format(printf, 1, 2)))
#endif
inline void Tf_StubCodingError(const char* fmt, ...) { (void)fmt; }

#define TF_CODING_ERROR(...) pxr::Tf_StubCodingError(__VA_ARGS__)
#define TF_WARN(...) pxr::Tf_StubCodingError(__VA_ARGS__)
#define TF_RUNTIME_ERROR(...) pxr::Tf_StubCodingError(__VA_ARGS__)

PXR_NAMESPACE_CLOSE_SCOPE
