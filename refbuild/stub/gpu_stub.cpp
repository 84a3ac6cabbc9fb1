/* No-op link-time definitions of the reference's GPU kernel entry points
 * (declared in TimeLayer3D.h:29-34 and AdiSolver3D.h:40-46).  The CPU
 * backend never calls them.  Includes the real headers so the mangled
 * signatures match. */
#include "../src/FluidSolver3D/AdiSolver3D.h"

#include <cstdio>
#include <cstdlib>

static void die() {
    std::fprintf(stderr, "GPU path unavailable in CPU-only reference build\n");
    std::abort();
}

void CopyFieldTo_GPU(int, int, int, FTYPE**, FTYPE**, NodeType**, NodeType, int) { die(); }
void MergeFieldTo_GPU(int, int, int, FTYPE**, FTYPE**, NodeType**, NodeType, int) { die(); }
void CopyFromGrid_GPU(int, int, int, FTYPE**, FTYPE**, FTYPE**, FTYPE**, Node**, NodeType, int) { die(); }
void CopyGridBoundary_GPU(DirType, int, int, int, FTYPE**, FTYPE**, FTYPE**, FTYPE**, int*,
                          Segment3D**, NodesBoundary3D**, int) { die(); }
void Clear_GPU(int, int, int, FTYPE**, FTYPE**, FTYPE**, FTYPE**, NodeType**, NodeType,
               FTYPE, FTYPE, FTYPE, FTYPE, int) { die(); }
void Transpose_GPU(int, int, int, FTYPE**, FTYPE**, int) { die(); }

namespace FluidSolver3D {
void SolveSegments_GPU(FTYPE, FluidParams, int*, Segment3D**, DirType, NodesBoundary3D**,
                       NodeType**, TimeLayer3D*, TimeLayer3D*, TimeLayer3D*, FTYPE**, FTYPE**,
                       int, FTYPE*) { die(); }
void SolveSegments_XY_GPU(FTYPE, FluidParams, int**, int**, int**, int**, Segment3D**,
                          Segment3D**, int, int, NodesBoundary3D**, NodesBoundary3D**,
                          NodeType**, TimeLayer3D*, TimeLayer3D*, TimeLayer3D*, TimeLayer3D*,
                          FTYPE**, FTYPE**, FTYPE**, FTYPE**) { die(); }
}  // namespace FluidSolver3D
