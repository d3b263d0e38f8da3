/* Stub of pxr/base/tf/staticTokens.h (see pxr/pxr.h header note).
 *
 * TF_DEFINE_PRIVATE_TOKENS(name, (a)(b)(c)) must yield an object `name`
 * with `name->a` etc. — implemented with the classic alternating-macro
 * sequence iteration (simple-token form only; the ((tok, "str")) form is
 * not used by the adapters). */
#pragma once

#include <pxr/base/tf/token.h>
#include <pxr/pxr.h>

#define _MSN_TF_CAT_I(a, b) a##b
#define _MSN_TF_CAT(a, b) _MSN_TF_CAT_I(a, b)

#define _MSN_TF_TOK_A(x) TfToken x{#x}; _MSN_TF_TOK_B
#define _MSN_TF_TOK_B(x) TfToken x{#x}; _MSN_TF_TOK_A
#define _MSN_TF_TOK_A_END
#define _MSN_TF_TOK_B_END

#define TF_DEFINE_PRIVATE_TOKENS(name, seq)                                \
    namespace {                                                            \
    struct _MSN_TF_CAT(name, _StubType) {                                  \
        _MSN_TF_CAT(_MSN_TF_TOK_A seq, _END)                               \
        const _MSN_TF_CAT(name, _StubType)* operator->() const {           \
            return this;                                                   \
        }                                                                  \
    };                                                                     \
    const _MSN_TF_CAT(name, _StubType) name;                               \
    }

#define TF_DECLARE_PUBLIC_TOKENS(...) /* not used by the adapters */
