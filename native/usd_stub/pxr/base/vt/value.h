/* Stub of pxr/base/vt/value.h (see pxr/pxr.h header note). Holds any
 * copyable type with typeid-based retrieval — enough for the adapter
 * layer's IsHolding/Get/UncheckedGet/Cast compile surface. */
#pragma once

#include <memory>
#include <string>
#include <type_traits>
#include <typeinfo>

#include <pxr/pxr.h>

PXR_NAMESPACE_OPEN_SCOPE

class VtValue {
  public:
    VtValue() = default;
    VtValue(const VtValue&) = default;
    VtValue(VtValue&&) = default;
    VtValue& operator=(const VtValue&) = default;
    VtValue& operator=(VtValue&&) = default;

    /* implicit, as in real VtValue */
    template <typename T,
              typename = typename std::enable_if<!std::is_same<
                  typename std::decay<T>::type, VtValue>::value>::type>
    VtValue(const T& v) : _held(new _Holder<T>(v)) {}

    bool IsEmpty() const { return !_held; }

    template <typename T>
    bool IsHolding() const {
        return _held && _held->type() == typeid(T);
    }

    template <typename T>
    const T& UncheckedGet() const {
        return static_cast<const _Holder<T>*>(_held.get())->value;
    }

    template <typename T>
    const T& Get() const {
        if (IsHolding<T>()) return UncheckedGet<T>();
        static const T fallback{};
        return fallback;
    }

    template <typename T>
    bool CanCast() const {
        return IsHolding<T>();
    }

    /* In-place cast, as in real VtValue (registry-driven there; identity
     * here — the stub only needs the expression shapes to type-check). */
    template <typename T>
    VtValue& Cast() {
        return *this;
    }

    std::string GetTypeName() const {
        return _held ? _held->type().name() : "<empty>";
    }

  private:
    struct _HolderBase {
        virtual ~_HolderBase() = default;
        virtual const std::type_info& type() const = 0;
    };
    template <typename T>
    struct _Holder final : _HolderBase {
        explicit _Holder(const T& v) : value(v) {}
        const std::type_info& type() const override { return typeid(T); }
        T value;
    };

    std::shared_ptr<const _HolderBase> _held;
};

PXR_NAMESPACE_CLOSE_SCOPE
