/* Render pass: one progressive MsnRender per color AOV; parity target
 * reference hydra/renderPass.{hpp,cpp}. */

#pragma once

#include <pxr/imaging/hd/renderPass.h>

PXR_NAMESPACE_OPEN_SCOPE

class HdMoonshineTpuRenderPass final : public HdRenderPass {
  public:
    HdMoonshineTpuRenderPass(HdRenderIndex* index,
                             HdRprimCollection const& collection);
    ~HdMoonshineTpuRenderPass() override;

  protected:
    void _Execute(HdRenderPassStateSharedPtr const& renderPassState,
                  TfTokenVector const& renderTags) override;
};

PXR_NAMESPACE_CLOSE_SCOPE
