#include "Common/PARAplan.h"
