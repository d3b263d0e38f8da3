/* Stub of pxr/usd/sdf/assetPath.h (see pxr/pxr.h header note). */
#pragma once

#include <string>

#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

class SdfAssetPath {
  public:
    SdfAssetPath() = default;
    explicit SdfAssetPath(const std::string& path) : _authored(path) {}
    SdfAssetPath(const std::string& path, const std::string& resolved)
        : _authored(path), _resolved(resolved) {}

    const std::string& GetAssetPath() const { return _authored; }
    const std::string& GetResolvedPath() const { return _resolved; }

  private:
    std::string _authored;
    std::string _resolved;
};

PXR_NAMESPACE_CLOSE_SCOPE
