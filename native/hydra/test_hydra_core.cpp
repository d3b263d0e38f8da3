// Mock-Hydra session: drives the delegate's USD-free core (hydra_core)
// against the real engine through the moonshine_tpu C ABI — the same code
// paths the USD adapter classes call, testable without a USD install.
//
// Covered behaviors (reference parity targets in hydra_core.hpp):
//   * polygon triangulation + vertex/face-varying primvar remapping
//   * point-instancer transform product incl. nested instancers
//   * UsdPreviewSurface parameter mapping (constants + raw texture)
//   * camera lens extraction from a USD-convention matrix
//   * the mesh Sync reconcile machine (create, move in place, hide)

#include "hydra_core.hpp"

#include <cmath>
#include <cstdio>
#include <cstring>

using msnh::Mat4;

static int fail(const char* what) {
    std::fprintf(stderr, "FAIL: %s\n", what);
    return 1;
}

static bool feq(double a, double b, double tol = 1e-5) {
    return std::fabs(a - b) <= tol;
}

int main() {
    // --- pure-math checks (no engine needed) ---

    // fan triangulation of [quad, tri]: 2 + 1 triangles
    msnh::Triangulation tri = msnh::Triangulate(
        {4, 3}, {0, 1, 2, 3, 4, 5, 6});
    if (tri.tri_count() != 3) return fail("triangulation count");
    const uint32_t want_idx[9] = {0, 1, 2, 0, 2, 3, 4, 5, 6};
    for (int i = 0; i < 9; ++i)
        if (tri.tri_indices[i] != want_idx[i])
            return fail("triangulation indices");
    // face-varying corners of the quad map through the fan
    const uint32_t want_src[9] = {0, 1, 2, 0, 2, 3, 4, 5, 6};
    for (int i = 0; i < 9; ++i)
        if (tri.corner_sources[i] != want_src[i])
            return fail("face-varying corner sources");
    if (tri.tri_faces[0] != 0 || tri.tri_faces[1] != 0 ||
        tri.tri_faces[2] != 1)
        return fail("tri faces");

    // instancer product: translate+scale primvars, nested with a parent
    msnh::InstancerPrimvars pv;
    pv.translations = {1, 0, 0, 0, 2, 0};
    pv.scales = {2, 2, 2, 1, 1, 1};
    std::vector<Mat4> inst = msnh::ComposeInstanceTransforms(
        Mat4::Translate(0, 0, 5), {0, 1}, pv);
    if (inst.size() != 2) return fail("instancer count");
    // instance 0: scale 2 then translate(1,0,0) then instancer (0,0,5):
    // point (1,0,0) -> (2,0,0) -> (3,0,0) -> (3,0,5)
    {
        const Mat4& m = inst[0];
        double x = 1 * m.m[0][0] + m.m[3][0];
        double z = 1 * m.m[0][2] + m.m[3][2];
        if (!feq(x, 3.0) || !feq(z, 5.0)) return fail("instancer compose");
    }
    // quaternion rotation: 90 deg about +z maps +x to +y (row-vector)
    {
        const double s = std::sin(M_PI / 4), c = std::cos(M_PI / 4);
        Mat4 r = Mat4::RotateQuat(c, 0, 0, s);
        double y = r.m[0][1];
        if (!feq(y, 1.0, 1e-9)) return fail("quat rotation");
    }
    std::vector<Mat4> nested = msnh::NestedProduct(
        {Mat4::Translate(0, 0, 1), Mat4::Translate(0, 0, 2)}, inst);
    if (nested.size() != 4) return fail("nested product count");

    // camera: identity transform looks down -z with +y up
    {
        MsnLens lens = msnh::LensFromCamera(Mat4::Identity(), 24.0f, 50.0f);
        if (!feq(lens.forward.z, -1.0f) || !feq(lens.up.y, 1.0f))
            return fail("camera axes");
        if (!feq(lens.vfov, 2.0f * std::atan(24.0f / 100.0f), 1e-6))
            return fail("camera vfov");
    }

    // rgb->rgba in-place padding (u8): last pixel intact, alpha opaque
    {
        uint8_t buf[8] = {1, 2, 3, 4, 5, 6, 0, 0};
        msnh::RgbToRgbaInPlace(buf, 2, 3, 4);
        const uint8_t want[8] = {1, 2, 3, 0xFF, 4, 5, 6, 0xFF};
        if (std::memcmp(buf, want, 8) != 0) return fail("rgb->rgba");
    }

    // --- engine-backed mock session ---
    MsnEngine* engine = MsnCreate();
    if (!engine) return fail("engine create");

    // "USD" quad mesh: one 4-gon, vertex points, face-varying sts
    std::vector<int> counts = {4};
    std::vector<int> indices = {0, 1, 2, 3};
    msnh::Triangulation qt = msnh::Triangulate(counts, indices);
    const MsnF32x3 points[4] = {
        {-3, -3, 0}, {3, -3, 0}, {3, 3, 0}, {-3, 3, 0}};
    std::vector<MsnF32x2> fv_st = {{0, 0}, {1, 0}, {1, 1}, {0, 1}};
    std::vector<MsnF32x2> st = msnh::FaceVaryingToCorner(qt, fv_st);
    if (st.size() != 6) return fail("st corner count");
    std::vector<MsnU32x3> tris(qt.tri_count());
    for (size_t t = 0; t < tris.size(); ++t)
        tris[t] = {qt.tri_indices[3 * t], qt.tri_indices[3 * t + 1],
                   qt.tri_indices[3 * t + 2]};
    MsnMeshHandle mesh = MsnCreateMesh(engine, points, 4, nullptr, 0,
                                       st.data(), st.size(), tris.data(),
                                       tris.size());

    // material via the UsdPreviewSurface mapping (constants + a 2x2
    // u8-srgb raw texture with rgb->rgba padding)
    MsnMaterialHandle mat = msnh::CreateDefaultMaterial(engine);
    msnh::PreviewValue diffuse;
    diffuse.kind = msnh::PreviewValue::kImage;
    diffuse.width = diffuse.height = 2;
    diffuse.format = MSN_TEXTURE_U8X4_SRGB;
    diffuse.rgb_needs_padding = true;
    diffuse.pixels = {200, 200, 200, 180, 180, 180,
                      160, 160, 160, 140, 140, 140};
    diffuse.pixels.resize(2 * 2 * 4);
    if (!msnh::ApplyPreviewSurfaceParam(engine, mat, "diffuseColor",
                                        diffuse))
        return fail("apply diffuseColor");
    msnh::PreviewValue rough;
    rough.kind = msnh::PreviewValue::kFloat;
    rough.f = 1.0f;
    if (!msnh::ApplyPreviewSurfaceParam(engine, mat, "roughness", rough))
        return fail("apply roughness");
    msnh::PreviewValue ior;
    ior.kind = msnh::PreviewValue::kFloat;
    ior.f = 1.5f;
    if (!msnh::ApplyPreviewSurfaceParam(engine, mat, "ior", ior))
        return fail("apply ior");
    if (msnh::ApplyPreviewSurfaceParam(engine, mat, "not_a_param", ior))
        return fail("unknown param accepted");

    // two instances through the instancer product + reconcile machine
    msnh::InstancerPrimvars ipv;
    ipv.translations = {-1.5, 0, 0, 1.5, 0, 0};
    std::vector<Mat4> transforms = msnh::ComposeInstanceTransforms(
        Mat4::Identity(), {0, 1}, ipv);
    msnh::InstancedMesh reconcile;
    reconcile.Update(engine, mesh, true, mat, true, transforms, true, true);
    if (reconcile.instances().size() != 2) return fail("instance count");

    // camera + sensor, 2 progressive frames
    Mat4 cam = Mat4::Identity();
    // lift the camera and pitch it down toward the quad (row-vector rows)
    cam.m[3][0] = 0;
    cam.m[3][1] = -4;
    cam.m[3][2] = 2;
    // rows are camera axes in world space: up row pitched forward, z row
    // pointing back (forward = -z maps to (0, 0.92, -0.38) — at the quad)
    cam.m[1][1] = 0.38;
    cam.m[1][2] = 0.92;
    cam.m[2][1] = -0.92;
    cam.m[2][2] = 0.38;
    MsnLens lens = msnh::LensFromCamera(cam, 24.0f, 18.0f);
    MsnLensHandle lens_h = MsnCreateLens(engine, lens);
    MsnSensorHandle sensor = MsnCreateSensor(engine, {32, 24});
    for (int i = 0; i < 2; ++i)
        if (!MsnRender(engine, sensor, lens_h)) return fail("render");
    if (MsnGetSensorSampleCount(engine, sensor) != 2)
        return fail("sample count");

    const float* px = MsnGetSensorData(engine, sensor);
    double mean = 0;
    bool finite = true, shaded = false;
    for (int i = 0; i < 32 * 24 * 4; ++i) {
        mean += px[i];
        finite &= std::isfinite(px[i]);
    }
    mean /= 32 * 24 * 4;
    for (int i = 0; i < 32 * 24; ++i) shaded |= px[i * 4] < 0.95f;
    if (!finite || mean <= 0.01) return fail("bad image");
    if (!shaded) return fail("quads not visible");

    // in-place transform update (no recreate), then hide (visibility path)
    std::vector<Mat4> moved = transforms;
    moved[1] = msnh::Mul(Mat4::Translate(0, 0, 50), moved[1]);
    reconcile.Update(engine, mesh, false, mat, false, moved, true, true);
    if (reconcile.instances().size() != 2)
        return fail("reconcile recreated on move");
    reconcile.Update(engine, mesh, false, mat, false, moved, false, false);
    MsnSensorHandle sensor2 = MsnCreateSensor(engine, {16, 12});
    if (!MsnRender(engine, sensor2, lens_h)) return fail("render hidden");
    const float* px2 = MsnGetSensorData(engine, sensor2);
    bool any_shaded = false;
    for (int i = 0; i < 16 * 12; ++i) any_shaded |= px2[i * 4] < 0.95f;
    if (any_shaded) return fail("hidden instances still visible");

    reconcile.Finalize(engine);
    MsnDestroy(engine);
    std::printf("hydra core ok: mean=%.4f\n", mean);
    return 0;
}
