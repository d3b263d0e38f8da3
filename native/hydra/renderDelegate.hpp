/* HdMoonshineTpu render delegate — USD adapter over hydra_core + the
 * moonshine_tpu C ABI. Compiled only when USD is available (see Makefile
 * `hydra` target); all testable logic lives in hydra_core.cpp.
 *
 * Parity: reference hydra/renderDelegate.{hpp,cpp} (prim factories, color
 * AOV, rebuildPipeline custom command). */

#pragma once

#include <memory>

#include <pxr/imaging/hd/renderDelegate.h>
#include <pxr/imaging/hd/resourceRegistry.h>

#include "../moonshine_tpu.h"

PXR_NAMESPACE_OPEN_SCOPE

class HdMoonshineTpuRenderParam final : public HdRenderParam {
  public:
    explicit HdMoonshineTpuRenderParam(MsnEngine* engine);
    MsnEngine* engine;
    MsnMaterialHandle default_material;
};

class HdMoonshineTpuRenderDelegate final : public HdRenderDelegate {
  public:
    HdMoonshineTpuRenderDelegate();
    explicit HdMoonshineTpuRenderDelegate(HdRenderSettingsMap const& map);
    ~HdMoonshineTpuRenderDelegate() override;

    const TfTokenVector& GetSupportedRprimTypes() const override;
    const TfTokenVector& GetSupportedSprimTypes() const override;
    const TfTokenVector& GetSupportedBprimTypes() const override;
    HdResourceRegistrySharedPtr GetResourceRegistry() const override;

    HdRenderPassSharedPtr CreateRenderPass(
        HdRenderIndex* index, HdRprimCollection const& collection) override;

    HdRprim* CreateRprim(TfToken const& typeId,
                         SdfPath const& rprimId) override;
    void DestroyRprim(HdRprim* rPrim) override;
    HdSprim* CreateSprim(TfToken const& typeId,
                         SdfPath const& sprimId) override;
    HdSprim* CreateFallbackSprim(TfToken const& typeId) override;
    void DestroySprim(HdSprim* sPrim) override;
    HdBprim* CreateBprim(TfToken const& typeId,
                         SdfPath const& bprimId) override;
    HdBprim* CreateFallbackBprim(TfToken const& typeId) override;
    void DestroyBprim(HdBprim* bPrim) override;
    HdInstancer* CreateInstancer(HdSceneDelegate* delegate,
                                 SdfPath const& id) override;
    void DestroyInstancer(HdInstancer* instancer) override;

    HdRenderParam* GetRenderParam() const override;
    void CommitResources(HdChangeTracker* tracker) override;
    HdAovDescriptor GetDefaultAovDescriptor(
        TfToken const& name) const override;

    /* custom command surface: rebuildPipeline (spec-constant re-jit) */
    HdCommandDescriptors GetCommandDescriptors() const override;
    bool InvokeCommand(const TfToken& command,
                       const HdCommandArgs& args) override;

    MsnEngine* engine() const { return _engine; }

  private:
    void _Initialize();

    static const TfTokenVector SUPPORTED_RPRIM_TYPES;
    static const TfTokenVector SUPPORTED_SPRIM_TYPES;
    static const TfTokenVector SUPPORTED_BPRIM_TYPES;

    MsnEngine* _engine = nullptr;
    HdResourceRegistrySharedPtr _resourceRegistry;
    std::unique_ptr<HdMoonshineTpuRenderParam> _renderParam;
};

PXR_NAMESPACE_CLOSE_SCOPE
