#include "Common/GPUplan.h"
