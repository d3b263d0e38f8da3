/* Stub of pxr/usd/sdf/path.h (see pxr/pxr.h header note). */
#pragma once

#include <functional>
#include <string>
#include <vector>

#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

class SdfPath {
  public:
    SdfPath() = default;
    explicit SdfPath(const std::string& path) : _path(path) {}

    static const SdfPath& EmptyPath() {
        static const SdfPath empty;
        return empty;
    }
    static const SdfPath& AbsoluteRootPath() {
        static const SdfPath root{std::string("/")};
        return root;
    }

    bool IsEmpty() const { return _path.empty(); }
    const std::string& GetString() const { return _path; }
    const char* GetText() const { return _path.c_str(); }

    bool operator==(const SdfPath& o) const { return _path == o._path; }
    bool operator!=(const SdfPath& o) const { return _path != o._path; }
    bool operator<(const SdfPath& o) const { return _path < o._path; }

  private:
    std::string _path;
};

using SdfPathVector = std::vector<SdfPath>;

PXR_NAMESPACE_CLOSE_SCOPE

namespace std {
template <>
struct hash<pxr::SdfPath> {
    size_t operator()(const pxr::SdfPath& p) const {
        return std::hash<std::string>()(p.GetString());
    }
};
}  // namespace std
