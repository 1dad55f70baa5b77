// fluidcore — native CPU engine for the stable-fluids solver.
//
// The modern replacement for the reference's scalar baseline
// (project/sequential/FluidSequential.c) and its SSE experiment
// (project/SIMD-SSE/FluidSIMD.cpp, which hand-rolled __m128 lane shifts and
// never finished): plain C++17 with OpenMP worksharing and
// auto-vectorizable inner loops over contiguous rows — the compiler emits
// the SIMD the reference wrote by hand.  Numerics match the reference
// operator-for-operator (same expression order per element); buffers are
// double-buffered with pointer swaps like the original (SWAP macro,
// FluidSequential.c:13).
//
// Exposed as a C ABI for ctypes; all grids are row-major (n+2)x(n+2) f32,
// index [j + i*(n+2)], updated in place.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Grid {
    float* p;
    int side;
    float* row(int i) const { return p + static_cast<std::size_t>(i) * side; }
};

inline float sign_of(int mode, bool x_wall) {
    // mode 1 flips at left/right walls, mode 2 at top/bottom, 0 copies.
    if (mode == 1 && x_wall) return -1.0f;
    if (mode == 2 && !x_wall) return -1.0f;
    return 1.0f;
}

void apply_boundary(int mode, Grid g) {
    const int n = g.side - 2;
    const float sx = sign_of(mode, true);
    const float sy = sign_of(mode, false);
    float* top = g.row(0);
    float* below_top = g.row(1);
    float* bottom = g.row(n + 1);
    float* above_bottom = g.row(n);
    for (int j = 1; j <= n; ++j) {
        top[j] = sy * below_top[j];
        bottom[j] = sy * above_bottom[j];
    }
    for (int i = 1; i <= n; ++i) {
        float* r = g.row(i);
        r[0] = sx * r[1];
        r[n + 1] = sx * r[n];
    }
    top[0] = 0.5f * (top[1] + below_top[0]);
    bottom[0] = 0.5f * (bottom[1] + above_bottom[0]);
    top[n + 1] = 0.5f * (top[n] + below_top[n + 1]);
    bottom[n + 1] = 0.5f * (bottom[n] + above_bottom[n + 1]);
}

void axpy_source(float* x, const float* s, float dt, std::size_t count) {
#pragma omp parallel for schedule(static)
    for (std::int64_t k = 0; k < static_cast<std::int64_t>(count); ++k)
        x[k] += dt * s[k];
}

// One Jacobi sweep into dst; src holds the previous iterate, rhs the
// right-hand side (FluidSequential.c:93-98 semantics).
void jacobi_sweep(Grid dst, Grid src, Grid rhs, float alpha, float beta) {
    const int n = dst.side - 2;
    const float inv = 1.0f / beta;  // beta is loop-invariant; keep the
                                    // division out of the hot loop but
                                    // divide (not multiply) per element to
                                    // match the reference bit pattern.
    (void)inv;
#pragma omp parallel for schedule(static)
    for (int i = 1; i <= n; ++i) {
        const float* up = src.row(i - 1);
        const float* mid = src.row(i);
        const float* down = src.row(i + 1);
        const float* r = rhs.row(i);
        float* out = dst.row(i);
        for (int j = 1; j <= n; ++j) {
            const float neigh = ((mid[j - 1] + mid[j + 1]) + up[j]) + down[j];
            out[j] = (r[j] + alpha * neigh) / beta;
        }
    }
}

void jacobi_solve(int mode, Grid x, Grid scratch, Grid rhs, float alpha,
                  float beta, int iters) {
    Grid a = x, b = scratch;
    for (int k = 0; k < iters; ++k) {
        jacobi_sweep(b, a, rhs, alpha, beta);
        apply_boundary(mode, b);
        std::swap(a, b);
    }
    if (a.p != x.p)
        std::memcpy(x.p, a.p,
                    sizeof(float) * static_cast<std::size_t>(x.side) * x.side);
}

void semi_lagrangian(int mode, Grid out, Grid d0, Grid u, Grid v, float dt0) {
    const int n = out.side - 2;
    const int side = out.side;
#pragma omp parallel for schedule(static)
    for (int i = 1; i <= n; ++i) {
        const float* ur = u.row(i);
        const float* vr = v.row(i);
        float* dst = out.row(i);
        for (int j = 1; j <= n; ++j) {
            float x = static_cast<float>(j) - dt0 * ur[j];
            float y = static_cast<float>(i) - dt0 * vr[j];
            x = std::min(std::max(x, 0.5f), n + 0.5f);
            y = std::min(std::max(y, 0.5f), n + 0.5f);
            const int j0 = static_cast<int>(x);
            const int i0 = static_cast<int>(y);
            const float s1 = x - static_cast<float>(j0);
            const float s0 = 1.0f - s1;
            const float t1 = y - static_cast<float>(i0);
            const float t0 = 1.0f - t1;
            const float* r0 = d0.p + static_cast<std::size_t>(i0) * side;
            const float* r1 = r0 + side;
            dst[j] = s0 * (t0 * r0[j0] + t1 * r1[j0]) +
                     s1 * (t0 * r0[j0 + 1] + t1 * r1[j0 + 1]);
        }
    }
    apply_boundary(mode, out);
}

void divergence_and_zero_pressure(Grid u, Grid v, Grid p, Grid div) {
    const int n = u.side - 2;
    const float h = 1.0f / static_cast<float>(n);
#pragma omp parallel for schedule(static)
    for (int i = 1; i <= n; ++i) {
        const float* ur = u.row(i);
        const float* vu = v.row(i - 1);
        const float* vd = v.row(i + 1);
        float* dr = div.row(i);
        float* pr = p.row(i);
        for (int j = 1; j <= n; ++j) {
            dr[j] = -0.5f * h * ((ur[j + 1] - ur[j - 1]) + (vd[j] - vu[j]));
            pr[j] = 0.0f;
        }
    }
    apply_boundary(0, div);
    apply_boundary(0, p);
}

void subtract_pressure_gradient(Grid u, Grid v, Grid p) {
    const int n = u.side - 2;
    const float h = 1.0f / static_cast<float>(n);
#pragma omp parallel for schedule(static)
    for (int i = 1; i <= n; ++i) {
        const float* pu = p.row(i - 1);
        const float* pm = p.row(i);
        const float* pd = p.row(i + 1);
        float* ur = u.row(i);
        float* vr = v.row(i);
        for (int j = 1; j <= n; ++j) {
            ur[j] -= 0.5f * (pm[j + 1] - pm[j - 1]) / h;
            vr[j] -= 0.5f * (pd[j] - pu[j]) / h;
        }
    }
    apply_boundary(1, u);
    apply_boundary(2, v);
}

struct Workspace {
    std::vector<float> scratch, p, div, keep;
};

void project(Grid u, Grid v, Grid p, Grid div, Grid scratch, int iters) {
    divergence_and_zero_pressure(u, v, p, div);
    jacobi_solve(0, p, scratch, div, 1.0f, 4.0f, iters);
    subtract_pressure_gradient(u, v, p);
}

}  // namespace

extern "C" {

// One full timestep, in place.  Buffers: state (dens,u,v) and per-step
// sources; sources also seed the Jacobi initial guess, matching the
// reference's buffer reuse (FluidSequential.c:201-204).
void fluidcore_step(float* dens, float* u, float* v, const float* dens_src,
                    const float* u_src, const float* v_src, int n, float dt,
                    float visc, float diff, int iters) {
    const int side = n + 2;
    const std::size_t count = static_cast<std::size_t>(side) * side;
    static thread_local Workspace ws;
    ws.scratch.resize(count);
    ws.p.resize(count);
    ws.div.resize(count);
    ws.keep.resize(count * 2);

    Grid gd{dens, side}, gu{u, side}, gv{v, side};
    Grid gs{ws.scratch.data(), side};
    Grid gp{ws.p.data(), side}, gdiv{ws.div.data(), side};
    Grid gu0{ws.keep.data(), side}, gv0{ws.keep.data() + count, side};

    // --- vel_step (FluidSequential.c:189-241) ---
    axpy_source(u, u_src, dt, count);
    axpy_source(v, v_src, dt, count);
    const float alpha_v = dt * visc * static_cast<float>(n) * n;
    const float beta_v = 1.0f + 4.0f * alpha_v;
    // rhs = updated field; initial guess = raw source buffer.
    std::memcpy(ws.div.data(), u, sizeof(float) * count);  // rhs staging
    std::memcpy(u, u_src, sizeof(float) * count);
    jacobi_solve(1, gu, gs, gdiv, alpha_v, beta_v, iters);
    std::memcpy(ws.div.data(), v, sizeof(float) * count);
    std::memcpy(v, v_src, sizeof(float) * count);
    jacobi_solve(2, gv, gs, gdiv, alpha_v, beta_v, iters);

    project(gu, gv, gp, gdiv, gs, iters);

    std::memcpy(gu0.p, u, sizeof(float) * count);
    std::memcpy(gv0.p, v, sizeof(float) * count);
    semi_lagrangian(1, gu, gu0, gu0, gv0, dt * static_cast<float>(n));
    semi_lagrangian(2, gv, gv0, gu0, gv0, dt * static_cast<float>(n));

    project(gu, gv, gp, gdiv, gs, iters);

    // --- dens_step (FluidSequential.c:176-186) ---
    axpy_source(dens, dens_src, dt, count);
    const float alpha_d = dt * diff * static_cast<float>(n) * n;
    const float beta_d = 1.0f + 4.0f * alpha_d;
    std::memcpy(ws.div.data(), dens, sizeof(float) * count);
    std::memcpy(dens, dens_src, sizeof(float) * count);
    jacobi_solve(0, gd, gs, gdiv, alpha_d, beta_d, iters);
    std::memcpy(gu0.p, dens, sizeof(float) * count);
    semi_lagrangian(0, gd, gu0, gu, gv, dt * static_cast<float>(n));
}

void fluidcore_jacobi(float* x, const float* x0, int n, int mode, float alpha,
                      float beta, int iters) {
    const int side = n + 2;
    const std::size_t count = static_cast<std::size_t>(side) * side;
    std::vector<float> scratch(count), rhs(x0, x0 + count);
    jacobi_solve(mode, Grid{x, side}, Grid{scratch.data(), side},
                 Grid{rhs.data(), side}, alpha, beta, iters);
}

void fluidcore_advect(float* out, const float* d0, const float* u,
                      const float* v, int n, int mode, float dt) {
    const int side = n + 2;
    std::vector<float> src(d0, d0 + static_cast<std::size_t>(side) * side);
    std::vector<float> uu(u, u + static_cast<std::size_t>(side) * side);
    std::vector<float> vv(v, v + static_cast<std::size_t>(side) * side);
    semi_lagrangian(mode, Grid{out, side}, Grid{src.data(), side},
                    Grid{uu.data(), side}, Grid{vv.data(), side},
                    dt * static_cast<float>(n));
}

int fluidcore_num_threads() {
#ifdef _OPENMP
    return omp_get_max_threads();
#else
    return 1;
#endif
}

}  // extern "C"
