/* Raw-dump netcdf replacement (see netcdf.h in this directory).
 *
 * Writing: nc_put_vara_double appends the record to "<path>.<var>.f64";
 *          nc_put_var_float writes "<path>.<var>.f32".
 * Reading: nc_open loads "<path>.rawnc", a sidecar produced by
 *          scripts/convert_nc.py with entries (name, dtype, dims, data). */
#include "netcdf.h"

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <string>
#include <vector>

namespace {

struct Entry {
    std::string name;
    int dtype;                 // 0 = f64, 1 = f32
    std::vector<int64_t> dims;
    std::vector<char> data;
};

struct Handle {
    std::string path;
    bool writing = false;
    std::vector<std::string> var_names;   // write mode: varid -> name
    std::vector<int> var_ndims;
    std::vector<Entry> entries;           // read mode
};

std::map<int, Handle> g_handles;
// var registry per path so re-opening a file we created for writing
// (the reference's per-layer nc_open in OutputNetCDF3D_layer) finds the ids
std::map<std::string, std::pair<std::vector<std::string>, std::vector<int>>> g_registry;
int g_next = 1;

Handle* get(int ncid) {
    auto it = g_handles.find(ncid);
    return it == g_handles.end() ? nullptr : &it->second;
}

}  // namespace

extern "C" {

int nc_create(const char* path, int, int* ncidp) {
    Handle h;
    h.path = path;
    h.writing = true;
    *ncidp = g_next++;
    g_handles[*ncidp] = h;
    return 0;
}

int nc_open(const char* path, int, int* ncidp) {
    Handle h;
    h.path = path;
    std::string sidecar = std::string(path) + ".rawnc";
    FILE* f = std::fopen(sidecar.c_str(), "rb");
    if (!f) {
        auto it = g_registry.find(path);
        if (it == g_registry.end()) return -1;
        h.writing = true;
        h.var_names = it->second.first;
        h.var_ndims = it->second.second;
        *ncidp = g_next++;
        g_handles[*ncidp] = h;
        return 0;
    }
    int32_t n = 0;
    if (std::fread(&n, 4, 1, f) != 1) { std::fclose(f); return -1; }
    for (int i = 0; i < n; i++) {
        Entry e;
        char name[64] = {0};
        if (std::fread(name, 1, 64, f) != 64) break;
        e.name = name;
        int32_t dt = 0, nd = 0;
        std::fread(&dt, 4, 1, f);
        std::fread(&nd, 4, 1, f);
        e.dtype = dt;
        int64_t total = 1;
        for (int d = 0; d < nd; d++) {
            int64_t v = 0;
            std::fread(&v, 8, 1, f);
            e.dims.push_back(v);
            total *= v;
        }
        size_t bytes = (size_t)total * (dt == 0 ? 8 : 4);
        e.data.resize(bytes);
        std::fread(e.data.data(), 1, bytes, f);
        h.entries.push_back(e);
    }
    std::fclose(f);
    *ncidp = g_next++;
    g_handles[*ncidp] = h;
    return 0;
}

int nc_close(int ncid) { g_handles.erase(ncid); return 0; }

int nc_def_dim(int, const char*, size_t, int* idp) { *idp = 0; return 0; }

int nc_def_var(int ncid, const char* name, int, int ndims, const int*, int* varidp) {
    Handle* h = get(ncid);
    *varidp = (int)h->var_names.size();
    h->var_names.push_back(name);
    h->var_ndims.push_back(ndims);
    g_registry[h->path] = {h->var_names, h->var_ndims};
    return 0;
}

int nc_enddef(int) { return 0; }
int nc_put_att_text(int, int, const char*, size_t, const char*) { return 0; }
int nc_put_att_float(int, int, const char*, int, size_t, const float*) { return 0; }
int nc_put_att_double(int, int, const char*, int, size_t, const double*) { return 0; }

int nc_put_var_float(int ncid, int varid, const float* data) {
    Handle* h = get(ncid);
    // only axis vars use this; size unknown here -> the reference writes
    // them once; we skip (axes reproducible from the config/bbox).
    (void)h; (void)varid; (void)data;
    return 0;
}

int nc_put_vara_double(int ncid, int varid, const size_t*, const size_t* count,
                       const double* data) {
    Handle* h = get(ncid);
    if (varid < 0 || varid >= (int)h->var_names.size()) return -1;
    size_t total = 1;
    for (int i = 0; i < h->var_ndims[varid]; i++) total *= count[i];
    std::string fn = h->path + "." + h->var_names[varid] + ".f64";
    FILE* f = std::fopen(fn.c_str(), "ab");
    std::fwrite(data, 8, total, f);
    std::fclose(f);
    return 0;
}

int nc_inq_dimid(int ncid, const char* name, int* idp) {
    Handle* h = get(ncid);
    for (size_t i = 0; i < h->entries.size(); i++)
        if (h->entries[i].name == name) { *idp = (int)i; return 0; }
    return -1;
}

int nc_inq_dimlen(int ncid, int dimid, size_t* lenp) {
    Handle* h = get(ncid);
    *lenp = (size_t)h->entries[dimid].dims[0];
    return 0;
}

int nc_inq_varid(int ncid, const char* name, int* varidp) {
    Handle* h = get(ncid);
    for (size_t i = 0; i < h->var_names.size(); i++)
        if (h->var_names[i] == name) { *varidp = (int)i; return 0; }
    return nc_inq_dimid(ncid, name, varidp);
}

int nc_get_var(int ncid, int varid, void* data) {
    Handle* h = get(ncid);
    Entry& e = h->entries[varid];
    std::memcpy(data, e.data.data(), e.data.size());
    return 0;
}

}  // extern "C"
