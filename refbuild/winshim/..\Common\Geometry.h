#include "Common/Geometry.h"
