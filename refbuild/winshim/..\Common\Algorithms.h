#include "Common/Algorithms.h"
