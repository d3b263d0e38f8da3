/* See renderPass.hpp. */

#include "renderPass.hpp"

#include <pxr/imaging/hd/renderIndex.h>
#include <pxr/imaging/hd/renderPassState.h>
#include <pxr/imaging/hd/tokens.h>

#include "camera.hpp"
#include "renderBuffer.hpp"
#include "renderDelegate.hpp"

PXR_NAMESPACE_OPEN_SCOPE

HdMoonshineTpuRenderPass::HdMoonshineTpuRenderPass(
    HdRenderIndex* index, HdRprimCollection const& collection)
    : HdRenderPass(index, collection) {}

HdMoonshineTpuRenderPass::~HdMoonshineTpuRenderPass() = default;

void HdMoonshineTpuRenderPass::_Execute(
    HdRenderPassStateSharedPtr const& renderPassState,
    TfTokenVector const&) {
    for (const auto& aov : renderPassState->GetAovBindings()) {
        if (aov.aovName != HdAovTokens->color) continue;
        auto* delegate = static_cast<HdMoonshineTpuRenderDelegate*>(
            GetRenderIndex()->GetRenderDelegate());
        const auto* camera = static_cast<const HdMoonshineTpuCamera*>(
            renderPassState->GetCamera());
        auto* buffer =
            static_cast<HdMoonshineTpuRenderBuffer*>(aov.renderBuffer);
        MsnRender(delegate->engine(), buffer->sensor(), camera->handle());
    }
}

PXR_NAMESPACE_CLOSE_SCOPE
