/* hydra_core — USD-free translation layer of the Hydra render delegate.
 *
 * Everything algorithmic about the delegate lives here, driven purely
 * through the moonshine_tpu C ABI: polygon triangulation + primvar
 * remapping (reference hydra/mesh.cpp:72-166), point-instancer transform
 * products (instancer.cpp:36-108), UsdPreviewSurface parameter mapping
 * (material.cpp:45-143), camera lens extraction (camera.cpp:14-40), and
 * the instance reconcile state machine of mesh.cpp's Sync (create vs
 * in-place transform/visibility update).
 *
 * The USD adapter classes (renderDelegate.cpp etc., compiled only when a
 * USD installation is present) are thin shims over these functions, so
 * the delegate's behavior is testable in any environment via
 * test_hydra_core.cpp — a mock Hydra session against the real engine.
 */

#pragma once

#include <cstdint>
#include <string>
#include <vector>

#include "../moonshine_tpu.h"

namespace msnh {

/* ---- topology (HdMeshUtil::ComputeTriangleIndices parity) ---- */

struct Triangulation {
    /* 3 entries per triangle: indices into the mesh's vertex array */
    std::vector<uint32_t> tri_indices;
    /* 3 entries per triangle: the flat face-corner each triangle corner
     * came from — the mapping ComputeTriangulatedFaceVaryingPrimvar
     * applies to face-varying data */
    std::vector<uint32_t> corner_sources;
    /* source polygon per triangle (HdMeshUtil's primitive params role) */
    std::vector<uint32_t> tri_faces;

    size_t tri_count() const { return tri_indices.size() / 3; }
};

/* Fan-triangulate polygons (counts >= 3; degenerate faces are skipped). */
Triangulation Triangulate(const std::vector<int>& face_vertex_counts,
                          const std::vector<int>& face_vertex_indices);

/* Vertex-interpolated primvar -> flat per-corner array (the reference
 * passes non-indexed attributes to the engine, mesh.cpp:90-97). */
template <typename T>
std::vector<T> VertexToCorner(const Triangulation& tri,
                              const std::vector<T>& per_vertex) {
    std::vector<T> out;
    out.reserve(tri.tri_indices.size());
    for (uint32_t ix : tri.tri_indices) out.push_back(per_vertex[ix]);
    return out;
}

/* Face-varying primvar -> flat per-corner array. */
template <typename T>
std::vector<T> FaceVaryingToCorner(const Triangulation& tri,
                                   const std::vector<T>& per_face_corner) {
    std::vector<T> out;
    out.reserve(tri.corner_sources.size());
    for (uint32_t src : tri.corner_sources) out.push_back(per_face_corner[src]);
    return out;
}

/* ---- transforms (USD row-vector convention: v' = v * M) ---- */

struct Mat4 {
    double m[4][4];
    static Mat4 Identity();
    static Mat4 Translate(double x, double y, double z);
    /* unit quaternion (w, x, y, z), GfMatrix4d::SetRotate parity */
    static Mat4 RotateQuat(double w, double x, double y, double z);
    static Mat4 Scale(double x, double y, double z);
};

/* row-vector product: apply `a` first, then `b` (USD's a * b). */
Mat4 Mul(const Mat4& a, const Mat4& b);

/* USD 4x4 -> engine 3x4 (column-vector rows), mesh.cpp:233-238 layout. */
MsnMat3x4 ToMsn(const Mat4& m);

struct InstancerPrimvars {
    /* any vector may be empty = primvar absent */
    std::vector<double> translations;  // 3 per instance
    std::vector<double> rotations;     // 4 per instance (w, x, y, z)
    std::vector<double> scales;        // 3 per instance
    std::vector<Mat4> transforms;      // 1 per instance
};

/* Per-prototype instance transforms, composed exactly like the reference
 * (instancer.cpp:70-95): translate, rotate, scale, then the matrix
 * primvar, all prepended onto the instancer transform. */
std::vector<Mat4> ComposeInstanceTransforms(
    const Mat4& instancer_transform,
    const std::vector<int>& instance_indices,
    const InstancerPrimvars& primvars);

/* Nested instancers: child x parent product (instancer.cpp:98-108). */
std::vector<Mat4> NestedProduct(const std::vector<Mat4>& parent,
                                const std::vector<Mat4>& child);

/* ---- camera (camera.cpp:14-40) ---- */

MsnLens LensFromCamera(const Mat4& transform, float vertical_aperture,
                       float focal_length);

/* ---- materials (material.cpp:45-143) ---- */

struct PreviewValue {
    enum Kind { kFloat, kVec3, kImage } kind = kFloat;
    float f = 0.0f;
    float v3[3] = {0, 0, 0};
    /* decoded image bytes; rgb data is padded to rgba in place by Apply */
    std::vector<uint8_t> pixels;
    uint32_t width = 0, height = 0;
    MsnTextureFormat format = MSN_TEXTURE_U8X4_SRGB;
    bool rgb_needs_padding = false;  // 3-channel source (f16x3 / u8x3)
};

/* In-place rgb -> rgba stride expansion (material.cpp rgbToRgba). `data`
 * must hold pixel_count * dst_bytes_per_pixel bytes. */
void RgbToRgbaInPlace(uint8_t* data, size_t pixel_count,
                      size_t src_bytes_per_pixel,
                      size_t dst_bytes_per_pixel);

/* Map one UsdPreviewSurface input (diffuseColor / emissiveColor / normal /
 * roughness / metallic / ior; useSpecularWorkflow ignored) onto the
 * engine material. Returns false for unknown parameter names. */
bool ApplyPreviewSurfaceParam(MsnEngine* engine, MsnMaterialHandle material,
                              const std::string& name, PreviewValue value);

/* The delegate's default material (renderParam.hpp parity: grey color,
 * dielectric 1.5, +z normal). */
MsnMaterialHandle CreateDefaultMaterial(MsnEngine* engine);

/* ---- instance reconcile (mesh.cpp Sync state machine) ---- */

class InstancedMesh {
  public:
    /* Reconcile engine instances with the wanted state. Geometry or
     * instance-count changes destroy + recreate; pure transform or
     * visibility changes update in place (the cheap engine paths). */
    void Update(MsnEngine* engine, MsnMeshHandle mesh, bool mesh_changed,
                MsnMaterialHandle material, bool material_changed,
                const std::vector<Mat4>& prototype_by_instance,
                bool transforms_changed, bool visible);
    void Finalize(MsnEngine* engine);

    const std::vector<MsnInstanceHandle>& instances() const {
        return instances_;
    }

  private:
    std::vector<MsnInstanceHandle> instances_;
    bool visible_ = true;
    bool created_ = false;
};

}  // namespace msnh
