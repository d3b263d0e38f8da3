/* Stub of pxr/imaging/hio/image.h + types.h (see pxr/pxr.h header note). */
#pragma once

#include <memory>
#include <string>

#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

enum HioFormat {
    HioFormatInvalid = -1,
    HioFormatUNorm8 = 0,
    HioFormatUNorm8Vec2,
    HioFormatUNorm8Vec3,
    HioFormatUNorm8Vec4,
    HioFormatUNorm8srgb,
    HioFormatUNorm8Vec2srgb,
    HioFormatUNorm8Vec3srgb,
    HioFormatUNorm8Vec4srgb,
    HioFormatSNorm8,
    HioFormatSNorm8Vec2,
    HioFormatSNorm8Vec3,
    HioFormatSNorm8Vec4,
    HioFormatFloat16,
    HioFormatFloat16Vec2,
    HioFormatFloat16Vec3,
    HioFormatFloat16Vec4,
    HioFormatFloat32,
    HioFormatFloat32Vec2,
    HioFormatFloat32Vec3,
    HioFormatFloat32Vec4,
    HioFormatCount
};

class HioImage;
using HioImageSharedPtr = std::shared_ptr<HioImage>;

class HioImage {
  public:
    enum SourceColorSpace { Raw, SRGB, Auto };

    struct StorageSpec {
        int width = 0;
        int height = 0;
        int depth = 0;
        HioFormat format = HioFormatInvalid;
        bool flipped = false;
        void* data = nullptr;
    };

    virtual ~HioImage() = default;

    static HioImageSharedPtr OpenForReading(
        std::string const& filename, int subimage = 0, int mip = 0,
        SourceColorSpace sourceColorSpace = Auto,
        bool suppressErrors = false) {
        (void)filename;
        (void)subimage;
        (void)mip;
        (void)sourceColorSpace;
        (void)suppressErrors;
        return nullptr;
    }

    virtual std::string const& GetFilename() const = 0;
    virtual int GetWidth() const = 0;
    virtual int GetHeight() const = 0;
    virtual HioFormat GetFormat() const = 0;
    virtual int GetBytesPerPixel() const = 0;
    virtual bool Read(StorageSpec const& storage) = 0;
    virtual bool Write(StorageSpec const& storage) = 0;
};

PXR_NAMESPACE_CLOSE_SCOPE
