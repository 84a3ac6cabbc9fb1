// Parity-oracle driver: loads a Shape3D case with the REFERENCE Grid3D and
// dumps the node-type mask + boundary data after Prepare(t) at a list of
// times.  This exposes the multi-frame interpolation path
// (Prepare3D_Shape subframe blend, Grid3D.cpp:854-898) that the shipped
// FluidSolver3D main only ever calls at t=0 (per-step Prepare is commented
// out, FluidSolver3D.cpp:237).  Used by tests/test_parity_heart3d.py.
//
// Usage: grid3d_probe <data> <dx> <dy> <dz> <baseT> <out_base> <t0> [t1 ...]
// Writes per time i: <out_base>_<i>.types (u8 per cell, x-major i,j,k) and
// <out_base>_<i>.vel (3 x f32 per cell), plus a one-line header to stdout.
#include <cstdio>
#include <cstdlib>

#include "FluidSolver3D/Grid3D.h"

using namespace Common;
using namespace FluidSolver3D;

int main(int argc, char **argv)
{
    if (argc < 8) {
        fprintf(stderr, "usage: %s data dx dy dz baseT out_base t...\n",
                argv[0]);
        return 2;
    }
    PARAplan *pplan = PARAplan::Instance();
    pplan->init(CPU);

    double dx = atof(argv[2]), dy = atof(argv[3]), dz = atof(argv[4]);
    double baseT = atof(argv[5]);
    Grid3D grid(dx, dy, dz, baseT, CPU, false);
    if (!grid.LoadFromFile(argv[1], false)) {
        fprintf(stderr, "load failed\n");
        return 1;
    }
    printf("dims %d %d %d frames %d cycle %.9f\n", grid.dimx, grid.dimy,
           grid.dimz, grid.GetFramesNum(), grid.GetCycleLength());

    char path[2048];
    for (int a = 7; a < argc; a++) {
        double t = atof(argv[a]);
        grid.Prepare(t);
        long n = (long)grid.dimx * grid.dimy * grid.dimz;
        unsigned char *types = new unsigned char[n];
        float *vel = new float[n * 3];
        long idx = 0;
        long n_in = 0;
        for (int i = 0; i < grid.dimx; i++)
            for (int j = 0; j < grid.dimy; j++)
                for (int k = 0; k < grid.dimz; k++, idx++) {
                    NodeType ty = grid.GetType(i, j, k);
                    types[idx] = (unsigned char)ty;
                    if (ty == NODE_IN) n_in++;
                    Vec3D v = grid.GetVel(i, j, k);
                    vel[idx * 3 + 0] = (float)v.x;
                    vel[idx * 3 + 1] = (float)v.y;
                    vel[idx * 3 + 2] = (float)v.z;
                }
        printf("t %.9f node_in %ld\n", t, n_in);
        snprintf(path, sizeof(path), "%s_%d.types", argv[6], a - 7);
        FILE *f = fopen(path, "wb");
        fwrite(types, 1, n, f);
        fclose(f);
        snprintf(path, sizeof(path), "%s_%d.vel", argv[6], a - 7);
        f = fopen(path, "wb");
        fwrite(vel, sizeof(float), n * 3, f);
        fclose(f);
        delete[] types;
        delete[] vel;
    }
    return 0;
}
