// Native host runtime for gpuseqalign_tpu.
//
// Fresh implementations (not ports) of the host-side hot paths:
//   * djb2-xor hashing over int32 streams
//   * NW linear-gap dense DP fills in four evaluation orders
//     (row-major / anti-diagonal / tile-diagonal / tile-diagonal + OpenMP),
//     the framework's analogs of the reference's four CPU algorithms
//     (ref: src/nwalign_cpu1..4_*.cpp)
//   * the reference-exact linear-gap traceback walk with RLE transcript
//     (semantics of ref: src/nwtrace1_plain.cpp:29-128)
//
// Built by native/build.py:  g++ -O3 -fopenmp -shared -fPIC

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

uint32_t nw_djb2_i32(const int32_t* data, int64_t n, uint32_t seed)
{
    uint32_t h = seed;
    for (int64_t k = 0; k < n; k++)
    {
        h = (h * 33u) ^ (uint32_t)data[k];
    }
    return h;
}

static inline int32_t max3i(int32_t a, int32_t b, int32_t c)
{
    int32_t m = a > b ? a : b;
    return m > c ? m : c;
}

// One DP cell update; H is row-major (adjrows x adjcols).
static inline void cell_update(int32_t* H, int adjcols, const int32_t* subst,
                               int substsz, const int32_t* Y, const int32_t* X,
                               int32_t g, int i, int j)
{
    const int32_t* hprev = H + (int64_t)(i - 1) * adjcols;
    int32_t* hcur = H + (int64_t)i * adjcols;
    int32_t diag = hprev[j - 1] + subst[(int64_t)Y[i] * substsz + X[j]];
    hcur[j] = max3i(diag, hprev[j] + g, hcur[j - 1] + g);
}

static void fill_headers(int32_t* H, int adjrows, int adjcols, int32_t g)
{
    for (int j = 0; j < adjcols; j++)
    {
        H[j] = (int32_t)j * g;
    }
    for (int i = 0; i < adjrows; i++)
    {
        H[(int64_t)i * adjcols] = (int32_t)i * g;
    }
}

// order: 0=row, 1=diag, 2=diagrow (tiled), 3=mt_diagrow (tiled + OpenMP).
int nw_align_dense(const int32_t* subst, int substsz,
                   const int32_t* Y, int adjrows,
                   const int32_t* X, int adjcols,
                   int32_t g, int order, int blocksz, int32_t* H)
{
    if (adjrows < 1 || adjcols < 1 || substsz < 1)
    {
        return 1;
    }
    fill_headers(H, adjrows, adjcols, g);
    const int rows = adjrows - 1;
    const int cols = adjcols - 1;

    switch (order)
    {
    case 0: // row-major
    {
        for (int i = 1; i <= rows; i++)
        {
            const int32_t* hprev = H + (int64_t)(i - 1) * adjcols;
            int32_t* hcur = H + (int64_t)i * adjcols;
            const int32_t* srow = subst + (int64_t)Y[i] * substsz;
            int32_t left = hcur[0];
            for (int j = 1; j <= cols; j++)
            {
                int32_t v = max3i(hprev[j - 1] + srow[X[j]],
                                  hprev[j] + g, left + g);
                hcur[j] = v;
                left = v;
            }
        }
        break;
    }
    case 1: // anti-diagonal element order
    {
        for (int d = 0; d < rows + cols - 1; d++)
        {
            int tbeg = std::max(0, d - (cols - 1));
            int tend = std::min(d + 1, rows);
            for (int t = tbeg; t < tend; t++)
            {
                cell_update(H, adjcols, subst, substsz, Y, X, g,
                            1 + t, 1 + (d - t));
            }
        }
        break;
    }
    case 2: // tile-diagonal outer order, row-major inside tiles
    case 3: // same, tiles of a diagonal in parallel (wavefront barrier)
    {
        if (blocksz < 1)
        {
            return 2;
        }
        const int trows = (rows + blocksz - 1) / blocksz;
        const int tcols = (cols + blocksz - 1) / blocksz;
        for (int td = 0; td < trows + tcols - 1; td++)
        {
            int tbeg = std::max(0, td - (tcols - 1));
            int tend = std::min(td + 1, trows);
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if (order == 3)
#endif
            for (int tt = tbeg; tt < tend; tt++)
            {
                int ibeg = 1 + tt * blocksz;
                int jbeg = 1 + (td - tt) * blocksz;
                int iend = std::min(ibeg + blocksz, 1 + rows);
                int jend = std::min(jbeg + blocksz, 1 + cols);
                for (int i = ibeg; i < iend; i++)
                {
                    for (int j = jbeg; j < jend; j++)
                    {
                        cell_update(H, adjcols, subst, substsz, Y, X, g, i, j);
                    }
                }
            }
        }
        break;
    }
    default:
        return 3;
    }
    return 0;
}

// Reference-exact NW linear-gap traceback (no debug-cells mode).
// Writes the RLE transcript into buf; returns its length, or -1 on overflow.
// out_hash gets djb2 over the transcript characters.
int64_t nw_trace_linear(const int32_t* H, int adjrows, int adjcols,
                        const int32_t* Y, const int32_t* X,
                        char* buf, int64_t cap, uint32_t* out_hash)
{
    int i = adjrows - 1;
    int j = adjcols - 1;
    // Collect edits walking backwards, then emit runs reversed.
    std::vector<char> edits;
    edits.reserve(adjrows + adjcols);
    while (true)
    {
        bool has = false;
        int32_t mx = 0;
        int di = 0, dj = 0;
        char edit = 0;
        if (i > 0 && j > 0)
        {
            mx = H[(int64_t)(i - 1) * adjcols + (j - 1)];
            has = true;
            di = -1;
            dj = -1;
            edit = (X[j] == Y[i]) ? '=' : 'X';
        }
        if (i > 0 && (!has || mx < H[(int64_t)(i - 1) * adjcols + j]))
        {
            mx = H[(int64_t)(i - 1) * adjcols + j];
            has = true;
            di = -1;
            dj = 0;
            edit = 'I';
        }
        if (j > 0 && (!has || mx < H[(int64_t)i * adjcols + (j - 1)]))
        {
            has = true;
            di = 0;
            dj = -1;
            edit = 'D';
        }
        i += di;
        j += dj;
        if (edit != 0)
        {
            edits.push_back(edit);
        }
        if (di == 0 && dj == 0)
        {
            break;
        }
    }

    // Runs in path order (top-left to bottom-right) as "<count><edit>".
    int64_t len = 0;
    int64_t n = (int64_t)edits.size();
    int64_t k = n;
    while (k > 0)
    {
        char e = edits[k - 1];
        int64_t run = 0;
        while (k > 0 && edits[k - 1] == e)
        {
            run++;
            k--;
        }
        char tmp[24];
        int m = 0;
        while (run > 0)
        {
            tmp[m++] = (char)('0' + (run % 10));
            run /= 10;
        }
        if (len + m + 1 > cap)
        {
            return -1;
        }
        for (int t = m - 1; t >= 0; t--)
        {
            buf[len++] = tmp[t];
        }
        buf[len++] = e;
    }

    uint32_t h = 5381;
    for (int64_t t = 0; t < len; t++)
    {
        h = (h * 33u) ^ (uint32_t)(unsigned char)buf[t];
    }
    *out_hash = h;
    return len;
}

} // extern "C"
