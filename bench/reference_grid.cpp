// Single-thread C++ baseline: sequential SRMP sweep on a grid Potts MRF.
//
// Faithful re-implementation of what the reference (pawelswoboda/LP_MP,
// header-only C++) computes per dual iteration on this workload, written as
// a tight loop (double precision, row-major forward sweep + reverse
// backward sweep, receive-from-earlier / send-omega-to-later per SRMP
// anisotropic weights).  This is a *generous* stand-in for LP_MP
// single-thread throughput: the real framework adds virtual dispatch and
// pointer-chasing on top of the same arithmetic.
//
// Usage: reference_grid H W L iters   -> prints {"its": ..., "lb": ...}
#include <cstdio>
#include <cstdlib>
#include <vector>
#include <chrono>
#include <cmath>
#include <random>
#include <algorithm>

using namespace std;

static inline void two_min(const double* v, int L, double& m1, double& m2, int& am) {
    m1 = 1e300; m2 = 1e300; am = 0;
    for (int i = 0; i < L; ++i) {
        if (v[i] < m1) { m2 = m1; m1 = v[i]; am = i; }
        else if (v[i] < m2) { m2 = v[i]; }
    }
}

struct Grid {
    int H, W, L;
    vector<double> u;          // [H][W][L]
    vector<double> hm1, hm2;   // [H][W-1][L]
    vector<double> vm1, vm2;   // [H-1][W][L]
    vector<double> hc;         // [H][W-1]
    vector<double> vc;         // [H-1][W]

    double* U(int r, int c) { return &u[(size_t)(r * W + c) * L]; }
    double* H1(int r, int c) { return &hm1[(size_t)(r * (W - 1) + c) * L]; }
    double* H2(int r, int c) { return &hm2[(size_t)(r * (W - 1) + c) * L]; }
    double* V1(int r, int c) { return &vm1[(size_t)(r * W + c) * L]; }
    double* V2(int r, int c) { return &vm2[(size_t)(r * W + c) * L]; }

    // potts marginal toward `own` side: own[x] + min(other[x], minexc+diff)
    void marginal(const double* own, const double* other, double diff, double* out) {
        double m1, m2; int am;
        two_min(other, L, m1, m2, am);
        for (int x = 0; x < L; ++x) {
            double exc = (x == am) ? m2 : m1;
            out[x] = own[x] + min(other[x], exc + diff);
        }
    }

    void receive(double* uu, double* own, const double* other, double diff) {
        double d[64];
        marginal(own, other, diff, d);
        for (int x = 0; x < L; ++x) { uu[x] += d[x]; own[x] -= d[x]; }
    }

    void send(double* uu, double* own, double w) {
        for (int x = 0; x < L; ++x) { own[x] += w * uu[x]; }
    }

    void update_cell(int r, int c, bool forward) {
        // receive from earlier neighbors, send 1/2 to later ones (SRMP)
        double* uu = U(r, c);
        int nsend = 0;
        if (forward) {
            if (c > 0) receive(uu, H2(r, c - 1), H1(r, c - 1), hc[r * (W - 1) + c - 1]);
            if (r > 0) receive(uu, V2(r - 1, c), V1(r - 1, c), vc[(r - 1) * W + c]);
            nsend = (c + 1 < W) + (r + 1 < H);
        } else {
            if (c + 1 < W) receive(uu, H1(r, c), H2(r, c), hc[r * (W - 1) + c]);
            if (r + 1 < H) receive(uu, V1(r, c), V2(r, c), vc[r * W + c]);
            nsend = (c > 0) + (r > 0);
        }
        if (!nsend) return;
        const double w = 0.5; // SRMP weight on grid (LP_MP.h:1393-1401 closed form)
        double keep = 1.0 - w * nsend;
        if (forward) {
            if (c + 1 < W) send(uu, H1(r, c), w);
            if (r + 1 < H) send(uu, V1(r, c), w);
        } else {
            if (c > 0) send(uu, H2(r, c - 1), w);
            if (r > 0) send(uu, V2(r - 1, c), w);
        }
        for (int x = 0; x < L; ++x) uu[x] *= keep;
    }

    void iterate() {
        for (int r = 0; r < H; ++r)
            for (int c = 0; c < W; ++c) update_cell(r, c, true);
        for (int r = H - 1; r >= 0; --r)
            for (int c = W - 1; c >= 0; --c) update_cell(r, c, false);
    }

    double lower_bound() {
        double lb = 0;
        for (int r = 0; r < H; ++r)
            for (int c = 0; c < W; ++c)
                lb += *min_element(U(r, c), U(r, c) + L);
        auto pair_lb = [&](double* a, double* b, double diff) {
            double diag = 1e300;
            for (int x = 0; x < L; ++x) diag = min(diag, a[x] + b[x]);
            double a1, a2, b1, b2; int ia, ib;
            two_min(a, L, a1, a2, ia);
            two_min(b, L, b1, b2, ib);
            double off = (ia != ib) ? a1 + b1 : min(a1 + b2, a2 + b1);
            return min(diag, off + diff);
        };
        for (int r = 0; r < H; ++r)
            for (int c = 0; c + 1 < W; ++c)
                lb += pair_lb(H1(r, c), H2(r, c), hc[r * (W - 1) + c]);
        for (int r = 0; r + 1 < H; ++r)
            for (int c = 0; c < W; ++c)
                lb += pair_lb(V1(r, c), V2(r, c), vc[r * W + c]);
        return lb;
    }
};

int main(int argc, char** argv) {
    // reference_grid H W L iters [instance.bin]
    // instance.bin: raw little-endian doubles u[H*W*L], hc[H*(W-1)], vc[(H-1)*W]
    int H = argc > 1 ? atoi(argv[1]) : 1000;
    int W = argc > 2 ? atoi(argv[2]) : 1000;
    int L = argc > 3 ? atoi(argv[3]) : 4;
    int iters = argc > 4 ? atoi(argv[4]) : 10;
    const char* file = argc > 5 ? argv[5] : nullptr;
    if (L > 64) { fprintf(stderr, "L too large\n"); return 1; }

    Grid g;
    g.H = H; g.W = W; g.L = L;
    g.u.resize((size_t)H * W * L);
    g.hm1.assign((size_t)H * (W - 1) * L, 0.0);
    g.hm2 = g.hm1;
    g.vm1.assign((size_t)(H - 1) * W * L, 0.0);
    g.vm2 = g.vm1;
    g.hc.resize((size_t)H * (W - 1));
    g.vc.resize((size_t)(H - 1) * W);
    if (file) {
        FILE* f = fopen(file, "rb");
        if (!f) { fprintf(stderr, "cannot open %s\n", file); return 1; }
        if (fread(g.u.data(), 8, g.u.size(), f) != g.u.size() ||
            fread(g.hc.data(), 8, g.hc.size(), f) != g.hc.size() ||
            fread(g.vc.data(), 8, g.vc.size(), f) != g.vc.size()) {
            fprintf(stderr, "short read\n"); return 1;
        }
        fclose(f);
    } else {
        mt19937_64 rng(1);
        normal_distribution<double> nd;
        for (auto& x : g.u) x = nd(rng);
        for (auto& x : g.hc) x = fabs(nd(rng));
        for (auto& x : g.vc) x = fabs(nd(rng));
    }

    g.iterate(); // warmup (also the first dual iteration)
    auto t0 = chrono::steady_clock::now();
    for (int i = 0; i < iters - 1; ++i) g.iterate();
    double dt = chrono::duration<double>(chrono::steady_clock::now() - t0).count();
    printf("{\"its\": %.4f, \"lb\": %.9f}\n", (iters - 1) / dt, g.lower_bound());
    return 0;
}
