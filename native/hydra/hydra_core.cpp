/* See hydra_core.hpp. Reference behaviors cited per function. */

#include "hydra_core.hpp"

#include <cmath>
#include <cstring>

namespace msnh {

/* ---- topology ---- */

Triangulation Triangulate(const std::vector<int>& face_vertex_counts,
                          const std::vector<int>& face_vertex_indices) {
    Triangulation out;
    size_t corner = 0;
    for (size_t f = 0; f < face_vertex_counts.size(); ++f) {
        int n = face_vertex_counts[f];
        if (n < 3) {  // degenerate faces contribute nothing
            corner += n > 0 ? n : 0;
            continue;
        }
        for (int k = 1; k + 1 < n; ++k) {
            out.tri_indices.push_back(face_vertex_indices[corner]);
            out.tri_indices.push_back(face_vertex_indices[corner + k]);
            out.tri_indices.push_back(face_vertex_indices[corner + k + 1]);
            out.corner_sources.push_back(static_cast<uint32_t>(corner));
            out.corner_sources.push_back(static_cast<uint32_t>(corner + k));
            out.corner_sources.push_back(
                static_cast<uint32_t>(corner + k + 1));
            out.tri_faces.push_back(static_cast<uint32_t>(f));
        }
        corner += n;
    }
    return out;
}

/* ---- transforms ---- */

Mat4 Mat4::Identity() {
    Mat4 r{};
    for (int i = 0; i < 4; ++i) r.m[i][i] = 1.0;
    return r;
}

Mat4 Mat4::Translate(double x, double y, double z) {
    Mat4 r = Identity();
    r.m[3][0] = x;
    r.m[3][1] = y;
    r.m[3][2] = z;
    return r;
}

Mat4 Mat4::Scale(double x, double y, double z) {
    Mat4 r = Identity();
    r.m[0][0] = x;
    r.m[1][1] = y;
    r.m[2][2] = z;
    return r;
}

Mat4 Mat4::RotateQuat(double w, double x, double y, double z) {
    /* row-vector rotation (GfMatrix4d::SetRotate): the transpose of the
     * standard column-vector quaternion matrix */
    Mat4 r = Identity();
    const double xx = x * x, yy = y * y, zz = z * z;
    const double xy = x * y, xz = x * z, yz = y * z;
    const double wx = w * x, wy = w * y, wz = w * z;
    r.m[0][0] = 1 - 2 * (yy + zz);
    r.m[0][1] = 2 * (xy + wz);
    r.m[0][2] = 2 * (xz - wy);
    r.m[1][0] = 2 * (xy - wz);
    r.m[1][1] = 1 - 2 * (xx + zz);
    r.m[1][2] = 2 * (yz + wx);
    r.m[2][0] = 2 * (xz + wy);
    r.m[2][1] = 2 * (yz - wx);
    r.m[2][2] = 1 - 2 * (xx + yy);
    return r;
}

Mat4 Mul(const Mat4& a, const Mat4& b) {
    Mat4 r{};
    for (int i = 0; i < 4; ++i)
        for (int j = 0; j < 4; ++j) {
            double s = 0.0;
            for (int k = 0; k < 4; ++k) s += a.m[i][k] * b.m[k][j];
            r.m[i][j] = s;
        }
    return r;
}

MsnMat3x4 ToMsn(const Mat4& t) {
    /* engine row r = USD column r (mesh.cpp:233-238): converts the
     * row-vector 4x4 to a column-vector 3x4 */
    MsnMat3x4 out;
    for (int r = 0; r < 3; ++r)
        for (int c = 0; c < 4; ++c)
            out.m[4 * r + c] = static_cast<float>(t.m[c][r]);
    return out;
}

std::vector<Mat4> ComposeInstanceTransforms(
    const Mat4& instancer_transform,
    const std::vector<int>& instance_indices,
    const InstancerPrimvars& pv) {
    std::vector<Mat4> out;
    out.reserve(instance_indices.size());
    const size_t nt = pv.translations.size() / 3;
    const size_t nr = pv.rotations.size() / 4;
    const size_t ns = pv.scales.size() / 3;
    for (size_t i = 0; i < instance_indices.size(); ++i) {
        const size_t ix = static_cast<size_t>(instance_indices[i]);
        Mat4 m = instancer_transform;
        /* prepend order matches instancer.cpp:70-92: T, R, S, matrix */
        if (ix < nt)
            m = Mul(Mat4::Translate(pv.translations[3 * ix],
                                    pv.translations[3 * ix + 1],
                                    pv.translations[3 * ix + 2]),
                    m);
        if (ix < nr)
            m = Mul(Mat4::RotateQuat(pv.rotations[4 * ix],
                                     pv.rotations[4 * ix + 1],
                                     pv.rotations[4 * ix + 2],
                                     pv.rotations[4 * ix + 3]),
                    m);
        if (ix < ns)
            m = Mul(Mat4::Scale(pv.scales[3 * ix], pv.scales[3 * ix + 1],
                                pv.scales[3 * ix + 2]),
                    m);
        if (ix < pv.transforms.size()) m = Mul(pv.transforms[ix], m);
        out.push_back(m);
    }
    return out;
}

std::vector<Mat4> NestedProduct(const std::vector<Mat4>& parent,
                                const std::vector<Mat4>& child) {
    std::vector<Mat4> out;
    out.reserve(parent.size() * child.size());
    for (const Mat4& p : parent)
        for (const Mat4& c : child) out.push_back(Mul(c, p));
    return out;
}

/* ---- camera ---- */

MsnLens LensFromCamera(const Mat4& t, float vertical_aperture,
                       float focal_length) {
    /* row-vector transform: point (0,0,0) -> row 3; directions map
     * through the linear rows (camera.cpp:18-31) */
    auto dir = [&](double x, double y, double z, MsnF32x3* out) {
        double vx = x * t.m[0][0] + y * t.m[1][0] + z * t.m[2][0];
        double vy = x * t.m[0][1] + y * t.m[1][1] + z * t.m[2][1];
        double vz = x * t.m[0][2] + y * t.m[1][2] + z * t.m[2][2];
        double len = std::sqrt(vx * vx + vy * vy + vz * vz);
        if (len <= 0.0) len = 1.0;
        out->x = static_cast<float>(vx / len);
        out->y = static_cast<float>(vy / len);
        out->z = static_cast<float>(vz / len);
    };
    MsnLens lens;
    lens.origin = MsnF32x3{static_cast<float>(t.m[3][0]),
                           static_cast<float>(t.m[3][1]),
                           static_cast<float>(t.m[3][2])};
    dir(0, 0, -1, &lens.forward);
    dir(0, 1, 0, &lens.up);
    lens.vfov =
        2.0f * std::atan(vertical_aperture / (2.0f * focal_length));
    lens.aperture = 0.0f;
    lens.focus_distance = 1.0f;
    return lens;
}

/* ---- materials ---- */

void RgbToRgbaInPlace(uint8_t* data, size_t pixel_count,
                      size_t src_bytes_per_pixel,
                      size_t dst_bytes_per_pixel) {
    /* walk backwards so the expansion never overwrites unread source
     * pixels (material.cpp rgbToRgba) */
    for (size_t i = pixel_count; i-- > 0;) {
        for (size_t j = src_bytes_per_pixel; j-- > 0;) {
            data[dst_bytes_per_pixel * i + j] =
                data[src_bytes_per_pixel * i + j];
        }
        /* alpha slot: opaque for u8, 1.0 half = 0x3C00 for f16 */
        if (dst_bytes_per_pixel == 4) {
            data[4 * i + 3] = 0xFF;
        } else if (dst_bytes_per_pixel == 8) {
            data[8 * i + 6] = 0x00;
            data[8 * i + 7] = 0x3C;
        }
    }
}

static MsnImageHandle MakeTexture(MsnEngine* engine, PreviewValue& v) {
    switch (v.kind) {
        case PreviewValue::kFloat:
            return MsnCreateSolidTexture1(engine, v.f);
        case PreviewValue::kVec3:
            return MsnCreateSolidTexture3(
                engine, MsnF32x3{v.v3[0], v.v3[1], v.v3[2]});
        case PreviewValue::kImage: {
            const size_t pixels =
                static_cast<size_t>(v.width) * v.height;
            if (v.rgb_needs_padding) {
                const size_t dst_bpp =
                    v.format == MSN_TEXTURE_F16X4 ? 8 : 4;
                const size_t src_bpp = dst_bpp / 4 * 3;
                v.pixels.resize(pixels * dst_bpp);
                RgbToRgbaInPlace(v.pixels.data(), pixels, src_bpp,
                                 dst_bpp);
                v.rgb_needs_padding = false;
            }
            return MsnCreateRawTexture(engine, v.pixels.data(),
                                       MsnExtent2D{v.width, v.height},
                                       v.format);
        }
    }
    return MSN_NO_IMAGE;
}

bool ApplyPreviewSurfaceParam(MsnEngine* engine, MsnMaterialHandle mat,
                              const std::string& name, PreviewValue value) {
    if (name == "ior") {
        MsnSetMaterialIOR(engine, mat, value.kind == PreviewValue::kFloat
                                           ? value.f
                                           : 1.5f);
        return true;
    }
    if (name == "useSpecularWorkflow") return true;  // silently unsupported
    if (name == "diffuseColor") {
        MsnSetMaterialColor(engine, mat, MakeTexture(engine, value));
        return true;
    }
    if (name == "emissiveColor") {
        MsnSetMaterialEmissive(engine, mat, MakeTexture(engine, value));
        return true;
    }
    if (name == "normal") {
        MsnSetMaterialNormal(engine, mat, MakeTexture(engine, value));
        return true;
    }
    if (name == "roughness") {
        MsnSetMaterialRoughness(engine, mat, MakeTexture(engine, value));
        return true;
    }
    if (name == "metallic") {
        MsnSetMaterialMetalness(engine, mat, MakeTexture(engine, value));
        return true;
    }
    return false;
}

MsnMaterialHandle CreateDefaultMaterial(MsnEngine* engine) {
    MsnMaterial m;
    m.normal = MsnCreateSolidTexture3(engine, MsnF32x3{0.5f, 0.5f, 1.0f});
    m.emissive = MsnCreateSolidTexture3(engine, MsnF32x3{0, 0, 0});
    m.color = MsnCreateSolidTexture3(engine, MsnF32x3{0.5f, 0.5f, 0.5f});
    m.metalness = MsnCreateSolidTexture1(engine, 0.0f);
    m.roughness = MsnCreateSolidTexture1(engine, 1.0f);
    m.ior = 1.5f;
    return MsnCreateMaterial(engine, m);
}

/* ---- instance reconcile ---- */

void InstancedMesh::Update(MsnEngine* engine, MsnMeshHandle mesh,
                           bool mesh_changed, MsnMaterialHandle material,
                           bool material_changed,
                           const std::vector<Mat4>& prototype_by_instance,
                           bool transforms_changed, bool visible) {
    const bool count_changed =
        instances_.size() != prototype_by_instance.size();
    const bool recreate =
        !created_ || mesh_changed || material_changed || count_changed;

    if (recreate) {
        for (MsnInstanceHandle h : instances_)
            MsnDestroyInstance(engine, h);
        instances_.clear();
        MsnGeometry geometry{mesh, material, false};
        for (const Mat4& t : prototype_by_instance)
            instances_.push_back(MsnCreateInstance(engine, ToMsn(t),
                                                   &geometry, 1, visible));
        created_ = true;
        visible_ = visible;
        return;
    }

    if (transforms_changed) {
        for (size_t i = 0; i < instances_.size(); ++i)
            MsnSetInstanceTransform(engine, instances_[i],
                                    ToMsn(prototype_by_instance[i]));
    }
    if (visible != visible_) {
        for (MsnInstanceHandle h : instances_)
            MsnSetInstanceVisibility(engine, h, visible);
        visible_ = visible;
    }
}

void InstancedMesh::Finalize(MsnEngine* engine) {
    for (MsnInstanceHandle h : instances_) MsnDestroyInstance(engine, h);
    instances_.clear();
    created_ = false;
}

}  // namespace msnh
