/* Stub of pxr/base/tf/type.h + registryManager.h TF_REGISTRY_FUNCTION
 * (see pxr/pxr.h header note). */
#pragma once

#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

class TfType {
  public:
    template <typename T>
    static TfType const& Define() {
        static TfType t;
        return t;
    }
};

PXR_NAMESPACE_CLOSE_SCOPE

/* Expands to a file-local function definition whose body follows the
 * macro invocation, as in real registryManager.h. */
#define TF_REGISTRY_FUNCTION(KEY)                                          \
    static void _MSN_TF_CAT(_Tf_RegistryFunction_, __LINE__)(pxr::KEY*,    \
                                                             void*);       \
    namespace {                                                            \
    struct _MSN_TF_CAT(_Tf_RegistryInit_, __LINE__) {                      \
        _MSN_TF_CAT(_Tf_RegistryInit_, __LINE__)() {                       \
            _MSN_TF_CAT(_Tf_RegistryFunction_, __LINE__)(nullptr,          \
                                                         nullptr);         \
        }                                                                  \
    } _MSN_TF_CAT(_tf_registry_init_, __LINE__);                           \
    }                                                                      \
    static void _MSN_TF_CAT(_Tf_RegistryFunction_, __LINE__)(pxr::KEY*,    \
                                                             void*)

#ifndef _MSN_TF_CAT
#define _MSN_TF_CAT_I(a, b) a##b
#define _MSN_TF_CAT(a, b) _MSN_TF_CAT_I(a, b)
#endif
