/* Stub of pxr/imaging/hd/mesh.h (see pxr/pxr.h header note). */
#pragma once

#include <pxr/imaging/hd/meshTopology.h>
#include <pxr/imaging/hd/rprim.h>
#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

class HdMesh : public HdRprim {
  protected:
    explicit HdMesh(SdfPath const& id) : HdRprim(id) {}

    HdMeshTopology GetMeshTopology(HdSceneDelegate* delegate) const {
        return delegate->GetMeshTopology(GetId());
    }
};

PXR_NAMESPACE_CLOSE_SCOPE
