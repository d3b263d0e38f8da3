/* Stub alias header (see pxr/pxr.h header note). */
#pragma once
#include <pxr/base/gf/vec2f.h>
