/* Minimal CUDA runtime API stub so the reference's CPU path compiles
 * without a CUDA toolkit.  The CPU backend never executes these calls
 * (guarded by backend==CPU); they only need to exist for compilation.
 * cudaMalloc/cudaHostAlloc are malloc-backed so accidental use is safe. */
#pragma once
#include <cstdlib>
#include <cstring>

typedef int cudaError_t;
typedef cudaError_t cudaError;
typedef void* cudaStream_t;
typedef void* cudaEvent_t;

enum {
    cudaSuccess = 0,
    cudaErrorPeerAccessAlreadyEnabled = 704,
};

enum cudaMemcpyKind {
    cudaMemcpyHostToHost = 0,
    cudaMemcpyHostToDevice = 1,
    cudaMemcpyDeviceToHost = 2,
    cudaMemcpyDeviceToDevice = 3,
};

enum { cudaHostAllocDefault = 0 };

struct cudaDeviceProp {
    char name[256];
    size_t totalGlobalMem;
    int major, minor;
};

static inline cudaError_t cudaGetDeviceCount(int* n) { *n = 1; return cudaSuccess; }
static inline cudaError_t cudaSetDevice(int) { return cudaSuccess; }
static inline cudaError_t cudaGetDevice(int* d) { *d = 0; return cudaSuccess; }
static inline cudaError_t cudaGetDeviceProperties(cudaDeviceProp* p, int) {
    std::memset(p, 0, sizeof(*p));
    std::strcpy(p->name, "stub");
    return cudaSuccess;
}
static inline cudaError_t cudaDeviceSynchronize() { return cudaSuccess; }
static inline cudaError_t cudaDeviceCanAccessPeer(int* ok, int, int) { *ok = 0; return cudaSuccess; }
static inline cudaError_t cudaDeviceEnablePeerAccess(int, unsigned) { return cudaSuccess; }
static inline cudaError_t cudaMalloc(void** p, size_t n) { *p = std::malloc(n); return cudaSuccess; }
template <typename T>
static inline cudaError_t cudaMalloc(T** p, size_t n) { *p = (T*)std::malloc(n); return cudaSuccess; }
static inline cudaError_t cudaFree(void* p) { std::free(p); return cudaSuccess; }
static inline cudaError_t cudaFreeHost(void* p) { std::free(p); return cudaSuccess; }
static inline cudaError_t cudaHostAlloc(void** p, size_t n, unsigned) { *p = std::malloc(n); return cudaSuccess; }
template <typename T>
static inline cudaError_t cudaHostAlloc(T** p, size_t n, unsigned) { *p = (T*)std::malloc(n); return cudaSuccess; }
static inline cudaError_t cudaMemcpy(void* d, const void* s, size_t n, cudaMemcpyKind) {
    std::memcpy(d, s, n); return cudaSuccess;
}
static inline cudaError_t cudaMemcpyAsync(void* d, const void* s, size_t n, cudaMemcpyKind,
                                          cudaStream_t = 0) {
    std::memcpy(d, s, n); return cudaSuccess;
}
static inline cudaError_t cudaMemcpyPeer(void* d, int, const void* s, int, size_t n) {
    std::memcpy(d, s, n); return cudaSuccess;
}
static inline cudaError_t cudaMemcpyPeerAsync(void* d, int, const void* s, int, size_t n,
                                              cudaStream_t = 0) {
    std::memcpy(d, s, n); return cudaSuccess;
}
static inline cudaError_t cudaStreamCreate(cudaStream_t* s) { *s = 0; return cudaSuccess; }
static inline cudaError_t cudaStreamDestroy(cudaStream_t) { return cudaSuccess; }
static inline cudaError_t cudaStreamSynchronize(cudaStream_t) { return cudaSuccess; }
static inline cudaError_t cudaEventCreate(cudaEvent_t* e) { *e = 0; return cudaSuccess; }
static inline cudaError_t cudaEventDestroy(cudaEvent_t) { return cudaSuccess; }
static inline const char* cudaGetErrorString(cudaError_t) { return "stub"; }
