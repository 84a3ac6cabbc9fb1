#include "Common/Timer.h"
