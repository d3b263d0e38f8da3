/* Stub of pxr/imaging/hd/rendererPluginRegistry.h
 * (see pxr/pxr.h header note). */
#pragma once

#include <pxr/base/tf/type.h>
#include <pxr/imaging/hd/rendererPlugin.h>
#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

class HdRendererPluginRegistry {
  public:
    template <typename T>
    static void Define() {
        /* real registry registers T's factory with the plug system;
         * instantiating the factory signature is the compile check */
        (void)static_cast<HdRendererPlugin* (*)()>(
            []() -> HdRendererPlugin* { return new T(); });
    }
};

PXR_NAMESPACE_CLOSE_SCOPE
