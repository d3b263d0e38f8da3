/* Stub of pxr/base/tf/token.h (see pxr/pxr.h header note). */
#pragma once

#include <cstddef>
#include <functional>
#include <string>
#include <vector>

#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

class TfToken {
  public:
    TfToken() = default;
    explicit TfToken(const std::string& s) : _str(s) {}
    explicit TfToken(const char* s) : _str(s) {}

    const std::string& GetString() const { return _str; }
    const char* GetText() const { return _str.c_str(); }
    bool IsEmpty() const { return _str.empty(); }
    size_t Hash() const { return std::hash<std::string>()(_str); }

    bool operator==(const TfToken& o) const { return _str == o._str; }
    bool operator!=(const TfToken& o) const { return _str != o._str; }
    bool operator<(const TfToken& o) const { return _str < o._str; }

    struct HashFunctor {
        size_t operator()(const TfToken& t) const { return t.Hash(); }
    };

  private:
    std::string _str;
};

using TfTokenVector = std::vector<TfToken>;

PXR_NAMESPACE_CLOSE_SCOPE

namespace std {
template <>
struct hash<pxr::TfToken> {
    size_t operator()(const pxr::TfToken& t) const { return t.Hash(); }
};
}  // namespace std
