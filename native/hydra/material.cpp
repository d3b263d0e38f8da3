/* See material.hpp. Network walk parity with reference hydra/material.cpp:
 * find the UsdPreviewSurface node feeding the surface terminal, then map
 * every input — file-texture connections load through HioImage (f16x3 and
 * u8-srgb rgb sources are padded to rgba by hydra_core), constants become
 * solid textures, ior sets the scalar. */

#include "material.hpp"

#include <pxr/imaging/hd/material.h>
#include <pxr/imaging/hio/image.h>
#include <pxr/usd/sdf/assetPath.h>
#include <pxr/usd/sdr/registry.h>
#include <pxr/usd/sdr/shaderNode.h>
#include <pxr/usd/sdr/shaderProperty.h>

#include "hydra_core.hpp"

PXR_NAMESPACE_OPEN_SCOPE

TF_DEFINE_PRIVATE_TOKENS(_tokens, (UsdPreviewSurface));

HdMoonshineTpuMaterial::HdMoonshineTpuMaterial(
    const SdfPath& id, const HdMoonshineTpuRenderParam& renderParam)
    : HdMaterial(id) {
    /* handle exists for the prim's whole lifetime (meshes may bind before
     * the first Sync) */
    _handle = msnh::CreateDefaultMaterial(renderParam.engine);
}

HdDirtyBits HdMoonshineTpuMaterial::GetInitialDirtyBitsMask() const {
    return DirtyBits::DirtyParams;
}

static bool LoadImageValue(const std::string& path,
                           msnh::PreviewValue* out) {
    HioImageSharedPtr image = HioImage::OpenForReading(path);
    if (!image) return false;
    const HioFormat format = image->GetFormat();
    if (format == HioFormatFloat16Vec3) {
        out->format = MSN_TEXTURE_F16X4;
        out->rgb_needs_padding = true;
    } else if (format == HioFormatFloat16Vec4) {
        out->format = MSN_TEXTURE_F16X4;
    } else if (format == HioFormatUNorm8Vec3srgb) {
        out->format = MSN_TEXTURE_U8X4_SRGB;
        out->rgb_needs_padding = true;
    } else if (format == HioFormatUNorm8Vec4srgb) {
        out->format = MSN_TEXTURE_U8X4_SRGB;
    } else {
        TF_CODING_ERROR("unsupported image format %u for %s",
                        static_cast<unsigned>(format), path.c_str());
        return false;
    }

    HioImage::StorageSpec spec;
    spec.width = image->GetWidth();
    spec.height = image->GetHeight();
    spec.format = format;
    spec.flipped = true;  // engine expects flipped v, flip at load
    const size_t src_size = static_cast<size_t>(spec.width) * spec.height *
                            image->GetBytesPerPixel();
    size_t alloc = src_size;
    if (out->rgb_needs_padding) alloc = src_size / 3 * 4;
    out->kind = msnh::PreviewValue::kImage;
    out->width = static_cast<uint32_t>(spec.width);
    out->height = static_cast<uint32_t>(spec.height);
    out->pixels.resize(alloc);
    spec.data = out->pixels.data();
    return image->Read(spec);
}

static msnh::PreviewValue ToPreviewValue(const VtValue& value) {
    msnh::PreviewValue out;
    if (value.IsHolding<SdfAssetPath>()) {
        LoadImageValue(value.Get<SdfAssetPath>().GetResolvedPath(), &out);
    } else if (value.IsHolding<GfVec3f>()) {
        const GfVec3f v = value.Get<GfVec3f>();
        out.kind = msnh::PreviewValue::kVec3;
        out.v3[0] = v[0];
        out.v3[1] = v[1];
        out.v3[2] = v[2];
    } else if (value.IsHolding<float>()) {
        out.kind = msnh::PreviewValue::kFloat;
        out.f = value.Get<float>();
    } else {
        TF_CODING_ERROR("unknown value type %s",
                        value.GetTypeName().c_str());
    }
    return out;
}

void HdMoonshineTpuMaterial::Sync(HdSceneDelegate* sceneDelegate,
                                  HdRenderParam* hdRenderParam,
                                  HdDirtyBits* dirtyBits) {
    SdfPath const& id = GetId();
    MsnEngine* engine =
        static_cast<HdMoonshineTpuRenderParam*>(hdRenderParam)->engine;

    if (*dirtyBits & DirtyBits::DirtyParams) {
        const VtValue& resource = sceneDelegate->GetMaterialResource(id);
        if (!resource.IsHolding<HdMaterialNetworkMap>()) {
            TF_CODING_ERROR("Unknown resource type of %s!", id.GetText());
            return;
        }
        const HdMaterialNetwork2 network = HdConvertToHdMaterialNetwork2(
            resource.UncheckedGet<HdMaterialNetworkMap>());

        const auto terminalIt =
            network.terminals.find(HdMaterialTerminalTokens->surface);
        if (terminalIt == network.terminals.end()) {
            TF_CODING_ERROR("no surface terminal in %s", id.GetText());
            return;
        }
        const auto nodeIt =
            network.nodes.find(terminalIt->second.upstreamNode);
        if (nodeIt == network.nodes.end()) return;
        const HdMaterialNode2& node = nodeIt->second;
        if (node.nodeTypeId != _tokens->UsdPreviewSurface) {
            TF_CODING_ERROR("unsupported surface node %s in %s",
                            node.nodeTypeId.GetText(), id.GetText());
            return;
        }

        SdrRegistry& reg = SdrRegistry::GetInstance();
        SdrShaderNodeConstPtr sdrNode =
            reg.GetShaderNodeByIdentifier(node.nodeTypeId);
        for (TfToken const& inputName : sdrNode->GetInputNames()) {
            const auto conIt = node.inputConnections.find(inputName);
            const auto paramIt = node.parameters.find(inputName);
            VtValue value;
            if (conIt != node.inputConnections.end()) {
                /* texture node: pull its asset path parameter */
                const HdMaterialConnection2& con = conIt->second.front();
                const auto upIt = network.nodes.find(con.upstreamNode);
                if (upIt == network.nodes.end()) continue;
                SdrShaderNodeConstPtr upSdr =
                    reg.GetShaderNodeByIdentifier(upIt->second.nodeTypeId);
                if (!upSdr ||
                    TfToken(upSdr->GetRole()) != SdrNodeRole->Texture) {
                    TF_CODING_ERROR("%s: unsupported connection on %s",
                                    id.GetText(), inputName.GetText());
                    continue;
                }
                const TfToken fileProp =
                    upSdr->GetAssetIdentifierInputNames()[0];
                const auto fileIt =
                    upIt->second.parameters.find(fileProp);
                if (fileIt == upIt->second.parameters.end()) continue;
                value = fileIt->second;
            } else if (paramIt != node.parameters.end()) {
                value = paramIt->second;
            } else {
                SdrShaderPropertyConstPtr input =
                    sdrNode->GetShaderInput(inputName);
                value = input->GetDefaultValue();
            }
            msnh::ApplyPreviewSurfaceParam(engine, _handle,
                                           inputName.GetString(),
                                           ToPreviewValue(value));
        }
        *dirtyBits &= ~DirtyBits::DirtyParams;
    }

    if (!HdChangeTracker::IsClean(*dirtyBits)) {
        TF_CODING_ERROR("Dirty bits %s of %s were ignored!",
                        HdChangeTracker::StringifyDirtyBits(*dirtyBits)
                            .c_str(),
                        id.GetText());
    }
}

PXR_NAMESPACE_CLOSE_SCOPE
