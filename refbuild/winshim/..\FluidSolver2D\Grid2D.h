#include "FluidSolver2D/Grid2D.h"
