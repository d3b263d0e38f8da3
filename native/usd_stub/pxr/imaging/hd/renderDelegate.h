/* Stub of pxr/imaging/hd/renderDelegate.h (see pxr/pxr.h header note). */
#pragma once

#include <map>
#include <memory>
#include <string>
#include <vector>

#include <pxr/base/tf/token.h>
#include <pxr/base/vt/value.h>
#include <pxr/imaging/hd/aov.h>
#include <pxr/imaging/hd/changeTracker.h>
#include <pxr/imaging/hd/renderPass.h>
#include <pxr/imaging/hd/resourceRegistry.h>
#include <pxr/imaging/hd/rprim.h>
#include <pxr/imaging/hd/types.h>
#include <pxr/usd/sdf/path.h>
#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

class HdRenderIndex;
class HdInstancer;

class HdRenderParam {
  public:
    HdRenderParam() = default;
    virtual ~HdRenderParam() = default;
};

using HdRenderSettingsMap = std::map<TfToken, VtValue>;

using HdCommandArgs = std::map<TfToken, VtValue>;

struct HdCommandArgDescriptor {
    TfToken argName;
    VtValue defaultValue;
};
using HdCommandArgDescriptors = std::vector<HdCommandArgDescriptor>;

struct HdCommandDescriptor {
    explicit HdCommandDescriptor(
        TfToken const& name_, std::string const& description_ = "",
        HdCommandArgDescriptors const& args_ = HdCommandArgDescriptors())
        : commandName(name_), commandDescription(description_),
          commandArgs(args_) {}

    const TfToken commandName;
    const std::string commandDescription;
    const HdCommandArgDescriptors commandArgs;
};
using HdCommandDescriptors = std::vector<HdCommandDescriptor>;

class HdRenderDelegate {
  public:
    virtual ~HdRenderDelegate() = default;

    virtual const TfTokenVector& GetSupportedRprimTypes() const = 0;
    virtual const TfTokenVector& GetSupportedSprimTypes() const = 0;
    virtual const TfTokenVector& GetSupportedBprimTypes() const = 0;

    virtual HdRenderParam* GetRenderParam() const { return nullptr; }
    virtual HdResourceRegistrySharedPtr GetResourceRegistry() const = 0;

    virtual HdRenderPassSharedPtr CreateRenderPass(
        HdRenderIndex* index, HdRprimCollection const& collection) = 0;

    virtual HdInstancer* CreateInstancer(HdSceneDelegate* delegate,
                                         SdfPath const& id) = 0;
    virtual void DestroyInstancer(HdInstancer* instancer) = 0;

    virtual HdRprim* CreateRprim(TfToken const& typeId,
                                 SdfPath const& rprimId) = 0;
    virtual void DestroyRprim(HdRprim* rPrim) = 0;
    virtual HdSprim* CreateSprim(TfToken const& typeId,
                                 SdfPath const& sprimId) = 0;
    virtual HdSprim* CreateFallbackSprim(TfToken const& typeId) = 0;
    virtual void DestroySprim(HdSprim* sprim) = 0;
    virtual HdBprim* CreateBprim(TfToken const& typeId,
                                 SdfPath const& bprimId) = 0;
    virtual HdBprim* CreateFallbackBprim(TfToken const& typeId) = 0;
    virtual void DestroyBprim(HdBprim* bprim) = 0;

    virtual void CommitResources(HdChangeTracker* tracker) = 0;

    virtual TfToken GetMaterialBindingPurpose() const {
        return TfToken("preview");
    }
    virtual TfTokenVector GetMaterialRenderContexts() const { return {}; }

    virtual HdAovDescriptor GetDefaultAovDescriptor(
        TfToken const& name) const {
        (void)name;
        return HdAovDescriptor();
    }

    virtual HdCommandDescriptors GetCommandDescriptors() const {
        return {};
    }
    virtual bool InvokeCommand(const TfToken& command,
                               const HdCommandArgs& args = HdCommandArgs()) {
        (void)command;
        (void)args;
        return false;
    }

    virtual void SetDrivers(/* HdDriverVector const& */) {}

  protected:
    HdRenderDelegate() = default;
    explicit HdRenderDelegate(HdRenderSettingsMap const& settingsMap)
        : _settingsMap(settingsMap) {}

    HdRenderSettingsMap _settingsMap;
};

PXR_NAMESPACE_CLOSE_SCOPE
