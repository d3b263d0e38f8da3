/* See renderDelegate.hpp. */

#include "renderDelegate.hpp"

#include <pxr/imaging/hd/extComputation.h>
#include <pxr/imaging/hd/tokens.h>

#include "camera.hpp"
#include "hydra_core.hpp"
#include "material.hpp"
#include "mesh.hpp"
#include "instancer.hpp"
#include "renderBuffer.hpp"
#include "renderPass.hpp"

PXR_NAMESPACE_OPEN_SCOPE

TF_DEFINE_PRIVATE_TOKENS(_tokens, (rebuildPipeline));

HdMoonshineTpuRenderParam::HdMoonshineTpuRenderParam(MsnEngine* e)
    : engine(e), default_material(msnh::CreateDefaultMaterial(e)) {}

const TfTokenVector HdMoonshineTpuRenderDelegate::SUPPORTED_RPRIM_TYPES = {
    HdPrimTypeTokens->mesh,
};
const TfTokenVector HdMoonshineTpuRenderDelegate::SUPPORTED_SPRIM_TYPES = {
    HdPrimTypeTokens->camera,
    HdPrimTypeTokens->extComputation,
    HdPrimTypeTokens->material,
};
const TfTokenVector HdMoonshineTpuRenderDelegate::SUPPORTED_BPRIM_TYPES = {
    HdPrimTypeTokens->renderBuffer,
};

HdMoonshineTpuRenderDelegate::HdMoonshineTpuRenderDelegate()
    : HdRenderDelegate() {
    _Initialize();
}

HdMoonshineTpuRenderDelegate::HdMoonshineTpuRenderDelegate(
    HdRenderSettingsMap const& map)
    : HdRenderDelegate(map) {
    _Initialize();
}

void HdMoonshineTpuRenderDelegate::_Initialize() {
    _engine = MsnCreate();
    _resourceRegistry = std::make_shared<HdResourceRegistry>();
    _renderParam = std::make_unique<HdMoonshineTpuRenderParam>(_engine);
}

HdMoonshineTpuRenderDelegate::~HdMoonshineTpuRenderDelegate() {
    _resourceRegistry.reset();
    MsnDestroy(_engine);
}

const TfTokenVector&
HdMoonshineTpuRenderDelegate::GetSupportedRprimTypes() const {
    return SUPPORTED_RPRIM_TYPES;
}
const TfTokenVector&
HdMoonshineTpuRenderDelegate::GetSupportedSprimTypes() const {
    return SUPPORTED_SPRIM_TYPES;
}
const TfTokenVector&
HdMoonshineTpuRenderDelegate::GetSupportedBprimTypes() const {
    return SUPPORTED_BPRIM_TYPES;
}

HdResourceRegistrySharedPtr
HdMoonshineTpuRenderDelegate::GetResourceRegistry() const {
    return _resourceRegistry;
}

HdRenderPassSharedPtr HdMoonshineTpuRenderDelegate::CreateRenderPass(
    HdRenderIndex* index, HdRprimCollection const& collection) {
    return HdRenderPassSharedPtr(
        new HdMoonshineTpuRenderPass(index, collection));
}

HdRprim* HdMoonshineTpuRenderDelegate::CreateRprim(TfToken const& typeId,
                                                   SdfPath const& rprimId) {
    if (typeId == HdPrimTypeTokens->mesh)
        return new HdMoonshineTpuMesh(rprimId, *_renderParam);
    TF_CODING_ERROR("Unknown Rprim type %s", typeId.GetText());
    return nullptr;
}

void HdMoonshineTpuRenderDelegate::DestroyRprim(HdRprim* rPrim) {
    delete rPrim;
}

HdSprim* HdMoonshineTpuRenderDelegate::CreateSprim(TfToken const& typeId,
                                                   SdfPath const& sprimId) {
    if (typeId == HdPrimTypeTokens->camera)
        return new HdMoonshineTpuCamera(sprimId);
    if (typeId == HdPrimTypeTokens->extComputation)
        return new HdExtComputation(sprimId);
    if (typeId == HdPrimTypeTokens->material)
        return new HdMoonshineTpuMaterial(sprimId, *_renderParam);
    TF_CODING_ERROR("Unknown Sprim type %s", typeId.GetText());
    return nullptr;
}

HdSprim* HdMoonshineTpuRenderDelegate::CreateFallbackSprim(
    TfToken const& typeId) {
    if (typeId == HdPrimTypeTokens->camera)
        return new HdMoonshineTpuCamera(SdfPath::EmptyPath());
    if (typeId == HdPrimTypeTokens->extComputation)
        return new HdExtComputation(SdfPath::EmptyPath());
    if (typeId == HdPrimTypeTokens->material)
        return new HdMoonshineTpuMaterial(SdfPath::EmptyPath(),
                                          *_renderParam);
    TF_CODING_ERROR("Unknown fallback Sprim type %s", typeId.GetText());
    return nullptr;
}

void HdMoonshineTpuRenderDelegate::DestroySprim(HdSprim* sPrim) {
    delete sPrim;
}

HdBprim* HdMoonshineTpuRenderDelegate::CreateBprim(TfToken const& typeId,
                                                   SdfPath const& bprimId) {
    if (typeId == HdPrimTypeTokens->renderBuffer)
        return new HdMoonshineTpuRenderBuffer(bprimId, this);
    TF_CODING_ERROR("Unknown Bprim type %s", typeId.GetText());
    return nullptr;
}

HdBprim* HdMoonshineTpuRenderDelegate::CreateFallbackBprim(
    TfToken const& typeId) {
    if (typeId == HdPrimTypeTokens->renderBuffer)
        return new HdMoonshineTpuRenderBuffer(SdfPath::EmptyPath(), this);
    TF_CODING_ERROR("Unknown fallback Bprim type %s", typeId.GetText());
    return nullptr;
}

void HdMoonshineTpuRenderDelegate::DestroyBprim(HdBprim* bPrim) {
    delete bPrim;
}

HdInstancer* HdMoonshineTpuRenderDelegate::CreateInstancer(
    HdSceneDelegate* delegate, SdfPath const& id) {
    return new HdMoonshineTpuInstancer(delegate, id);
}

void HdMoonshineTpuRenderDelegate::DestroyInstancer(HdInstancer* inst) {
    delete inst;
}

HdRenderParam* HdMoonshineTpuRenderDelegate::GetRenderParam() const {
    return _renderParam.get();
}

void HdMoonshineTpuRenderDelegate::CommitResources(HdChangeTracker*) {}

HdAovDescriptor HdMoonshineTpuRenderDelegate::GetDefaultAovDescriptor(
    TfToken const& name) const {
    if (name == HdAovTokens->color)
        return HdAovDescriptor(HdFormatFloat32Vec4, false,
                               VtValue(GfVec4f(0.0f)));
    return HdAovDescriptor();
}

HdCommandDescriptors
HdMoonshineTpuRenderDelegate::GetCommandDescriptors() const {
    return {HdCommandDescriptor(_tokens->rebuildPipeline,
                                "Rebuild pipeline", {})};
}

bool HdMoonshineTpuRenderDelegate::InvokeCommand(const TfToken& command,
                                                 const HdCommandArgs&) {
    if (command == _tokens->rebuildPipeline) {
        MsnRebuildPipeline(_engine);
        return true;
    }
    TF_CODING_ERROR("Unknown command %s!", command.GetText());
    return false;
}

PXR_NAMESPACE_CLOSE_SCOPE
