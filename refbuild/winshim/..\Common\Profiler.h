#include "Common/Profiler.h"
