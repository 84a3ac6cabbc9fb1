#include "Common/Config.h"
