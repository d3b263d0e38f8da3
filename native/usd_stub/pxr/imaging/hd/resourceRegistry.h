/* Stub of pxr/imaging/hd/resourceRegistry.h (see pxr/pxr.h header note). */
#pragma once

#include <memory>

#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

class HdResourceRegistry {
  public:
    HdResourceRegistry() = default;
    virtual ~HdResourceRegistry() = default;
    void GarbageCollect() {}
    void Commit() {}
};

using HdResourceRegistrySharedPtr = std::shared_ptr<HdResourceRegistry>;

PXR_NAMESPACE_CLOSE_SCOPE
