#include "Common/IO.h"
