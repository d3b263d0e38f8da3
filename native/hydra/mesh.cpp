/* See mesh.hpp. Behavior parity with reference hydra/mesh.cpp:
 * ext-computed (skinned/animated) points win over plain points, texcoords
 * found under st/st0, face-varying and vertex primvars both supported,
 * instancer product composed through hydra_core, and the recreate-vs-
 * update reconcile handled by msnh::InstancedMesh. */

#include "mesh.hpp"

#include <pxr/base/gf/matrix4d.h>
#include <pxr/base/gf/vec2f.h>
#include <pxr/base/gf/vec3f.h>
#include <pxr/imaging/hd/extComputationUtils.h>
#include <pxr/imaging/hd/instancer.h>
#include <pxr/imaging/hd/tokens.h>

#include "instancer.hpp"
#include "material.hpp"

PXR_NAMESPACE_OPEN_SCOPE

TF_DEFINE_PRIVATE_TOKENS(_tokens, (st)(st0)(normals));

static msnh::Mat4 FromGf(const GfMatrix4d& m) {
    msnh::Mat4 out;
    for (int i = 0; i < 4; ++i)
        for (int j = 0; j < 4; ++j) out.m[i][j] = m[i][j];
    return out;
}

HdMoonshineTpuMesh::HdMoonshineTpuMesh(
    SdfPath const& id, const HdMoonshineTpuRenderParam& renderParam)
    : HdMesh(id), _material(renderParam.default_material) {}

HdDirtyBits HdMoonshineTpuMesh::GetInitialDirtyBitsMask() const {
    return HdChangeTracker::DirtyPoints | HdChangeTracker::DirtyTransform |
           HdChangeTracker::DirtyInstancer |
           HdChangeTracker::DirtyVisibility |
           HdChangeTracker::DirtyMaterialId;
}

HdDirtyBits HdMoonshineTpuMesh::_PropagateDirtyBits(HdDirtyBits bits) const {
    return bits;
}

void HdMoonshineTpuMesh::_InitRepr(TfToken const&, HdDirtyBits*) {}

std::optional<HdInterpolation>
HdMoonshineTpuMesh::_FindPrimvarInterpolation(HdSceneDelegate* delegate,
                                              TfToken name) const {
    for (size_t i = 0; i < HdInterpolationCount; ++i) {
        const auto interp = static_cast<HdInterpolation>(i);
        for (const HdPrimvarDescriptor& pv :
             GetPrimvarDescriptors(delegate, interp)) {
            if (pv.name == name) return interp;
        }
    }
    return std::nullopt;
}

void HdMoonshineTpuMesh::Sync(HdSceneDelegate* sceneDelegate,
                              HdRenderParam* hdRenderParam,
                              HdDirtyBits* dirtyBits, TfToken const&) {
    SdfPath const& id = GetId();
    auto* renderParam =
        static_cast<HdMoonshineTpuRenderParam*>(hdRenderParam);
    MsnEngine* engine = renderParam->engine;
    HdRenderIndex& renderIndex = sceneDelegate->GetRenderIndex();

    const bool mesh_changed =
        HdChangeTracker::IsPrimvarDirty(*dirtyBits, id, HdTokens->points);
    if (mesh_changed) {
        const HdMeshTopology& topology = GetMeshTopology(sceneDelegate);
        std::vector<int> counts(topology.GetFaceVertexCounts().cbegin(),
                                topology.GetFaceVertexCounts().cend());
        std::vector<int> indices(topology.GetFaceVertexIndices().cbegin(),
                                 topology.GetFaceVertexIndices().cend());
        const msnh::Triangulation tri = msnh::Triangulate(counts, indices);

        // ext-computed (skinned/animated) points win over plain points
        VtVec3fArray points;
        for (size_t i = 0; i < HdInterpolationCount; ++i) {
            const auto interp = static_cast<HdInterpolation>(i);
            const auto compPrimvars =
                sceneDelegate->GetExtComputationPrimvarDescriptors(id,
                                                                   interp);
            for (auto const& pv : compPrimvars) {
                if (pv.name == HdTokens->points) {
                    auto store =
                        HdExtComputationUtils::GetComputedPrimvarValues(
                            compPrimvars, sceneDelegate);
                    points = store.find(pv.name)->second.Get<VtVec3fArray>();
                }
            }
        }
        if (points.empty())
            points =
                sceneDelegate->Get(id, HdTokens->points).Get<VtVec3fArray>();
        if (points.empty()) {
            TF_CODING_ERROR("empty mesh %s", id.GetText());
            return;
        }

        // primvars: vertex-interpolated stay indexed; face-varying are
        // expanded to flat per-corner arrays (engine supports both counts)
        auto fetch_vec3 = [&](TfToken name) -> std::vector<MsnF32x3> {
            VtValue boxed = sceneDelegate->Get(id, name);
            if (!boxed.IsHolding<VtVec3fArray>()) return {};
            auto interp = _FindPrimvarInterpolation(sceneDelegate, name);
            if (!interp) return {};
            const VtVec3fArray data = boxed.Get<VtVec3fArray>();
            std::vector<MsnF32x3> flat;
            if (*interp == HdInterpolationVertex) {
                for (uint32_t ix : tri.tri_indices)
                    flat.push_back({data[ix][0], data[ix][1], data[ix][2]});
            } else if (*interp == HdInterpolationFaceVarying) {
                for (uint32_t src : tri.corner_sources)
                    flat.push_back(
                        {data[src][0], data[src][1], data[src][2]});
            }
            return flat;
        };
        auto fetch_vec2 = [&](TfToken name) -> std::vector<MsnF32x2> {
            VtValue boxed = sceneDelegate->Get(id, name);
            if (!boxed.IsHolding<VtVec2fArray>()) return {};
            auto interp = _FindPrimvarInterpolation(sceneDelegate, name);
            if (!interp) return {};
            const VtVec2fArray data = boxed.Get<VtVec2fArray>();
            std::vector<MsnF32x2> flat;
            if (*interp == HdInterpolationVertex) {
                for (uint32_t ix : tri.tri_indices)
                    flat.push_back({data[ix][0], data[ix][1]});
            } else if (*interp == HdInterpolationFaceVarying) {
                for (uint32_t src : tri.corner_sources)
                    flat.push_back({data[src][0], data[src][1]});
            }
            return flat;
        };

        std::vector<MsnF32x2> texcoords;
        for (const TfToken& name : {_tokens->st, _tokens->st0}) {
            if (_FindPrimvarInterpolation(sceneDelegate, name)) {
                texcoords = fetch_vec2(name);
                break;
            }
        }
        const std::vector<MsnF32x3> normals = fetch_vec3(_tokens->normals);

        std::vector<MsnU32x3> tris(tri.tri_count());
        for (size_t t = 0; t < tris.size(); ++t)
            tris[t] = {tri.tri_indices[3 * t], tri.tri_indices[3 * t + 1],
                       tri.tri_indices[3 * t + 2]};

        _mesh = MsnCreateMesh(
            engine, reinterpret_cast<const MsnF32x3*>(points.cdata()),
            points.size(), normals.empty() ? nullptr : normals.data(),
            normals.size(),
            texcoords.empty() ? nullptr : texcoords.data(),
            texcoords.size(), tris.data(), tris.size());
        *dirtyBits &= ~HdChangeTracker::DirtyPoints;
    }

    if (HdChangeTracker::IsVisibilityDirty(*dirtyBits, id)) {
        _UpdateVisibility(sceneDelegate, dirtyBits);
        *dirtyBits &= ~HdChangeTracker::DirtyVisibility;
    }

    bool material_changed = *dirtyBits & HdChangeTracker::DirtyMaterialId;
    if (material_changed) {
        const SdfPath& materialId = sceneDelegate->GetMaterialId(id);
        _material = renderParam->default_material;
        if (!materialId.IsEmpty()) {
            if (HdSprim* sprim = renderIndex.GetSprim(
                    HdPrimTypeTokens->material, materialId))
                _material =
                    static_cast<HdMoonshineTpuMaterial*>(sprim)->handle();
        }
        *dirtyBits &= ~HdChangeTracker::DirtyMaterialId;
    }

    bool transform_changed =
        HdChangeTracker::IsTransformDirty(*dirtyBits, id);
    if (transform_changed) {
        _transform = FromGf(sceneDelegate->GetTransform(id));
        *dirtyBits &= ~HdChangeTracker::DirtyTransform;
    }

    const SdfPath instancerId = GetInstancerId();
    _UpdateInstancer(sceneDelegate, dirtyBits);
    HdInstancer::_SyncInstancerAndParents(renderIndex, instancerId);

    bool count_changed = false;
    if (HdChangeTracker::IsInstancerDirty(*dirtyBits, id)) {
        const size_t old_len = _instanceTransforms.size();
        _instanceTransforms.clear();
        if (instancerId.IsEmpty()) {
            _instanceTransforms.push_back(msnh::Mat4::Identity());
        } else {
            auto* instancer = static_cast<HdMoonshineTpuInstancer*>(
                renderIndex.GetInstancer(instancerId));
            _instanceTransforms = instancer->ComputeInstanceTransforms(id);
        }
        count_changed = old_len != _instanceTransforms.size();
        transform_changed = true;
        *dirtyBits &= ~HdChangeTracker::DirtyInstancer;
    }

    // prototype transform times each instancer product (row-vector order)
    std::vector<msnh::Mat4> world;
    world.reserve(_instanceTransforms.size());
    for (const msnh::Mat4& inst : _instanceTransforms)
        world.push_back(msnh::Mul(_transform, inst));

    _instances.Update(engine, _mesh, mesh_changed, _material,
                      material_changed || count_changed, world,
                      transform_changed, IsVisible());

    if (!HdChangeTracker::IsClean(*dirtyBits)) {
        TF_CODING_ERROR("Dirty bits %s of %s were ignored!",
                        HdChangeTracker::StringifyDirtyBits(*dirtyBits)
                            .c_str(),
                        id.GetText());
    }
}

void HdMoonshineTpuMesh::Finalize(HdRenderParam* renderParam) {
    _instances.Finalize(
        static_cast<HdMoonshineTpuRenderParam*>(renderParam)->engine);
}

PXR_NAMESPACE_CLOSE_SCOPE
