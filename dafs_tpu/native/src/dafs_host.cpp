// dafs_host: native host-side decode kernels for DAFS-TPU.
//
// The TPU path (JAX/Pallas) carries the heavy batched DP work; this library
// provides native-speed scalar versions of the two MEA decoders for host-mode
// solves (the --ipknot DD loop and the -v 2 verbose loop decode on host every
// iteration, dafs_tpu/dd.py:solve_by_dd_ipknot).
//
// These are scalar re-expressions of THIS PROJECT'S device formulations —
// dafs_tpu/ops/nussinov.py (_decode_ldiag_impl: span-ascending evaluation,
// candidate priority down/left/pair/splits with ascending split-span order,
// first maximum wins via strictly-greater replacement) and
// dafs_tpu/ops/nw.py (_decode_impl: row scan whose in-row gap dependency is a
// running maximum) — written from those specs, not from the reference C++.
// Bit-for-bit agreement with the reference's sequential semantics is pinned
// by tests/test_native.py against the disclosed oracle mirrors in /oracle.
//
// C ABI, consumed through ctypes (no pybind11 dependency).

#include <cstddef>
#include <cstdint>
#include <limits>
#include <utility>
#include <vector>

extern "C" {

// MEA Nussinov decode.  sm: row-major n x n float32 pair scores.
// Fills pair_of (int32 length n, -1 = unpaired); returns dp over [0, n-1].
//
// Candidate priority per cell [i, j] (first maximum wins; later candidates
// replace only on strictly greater, mirroring ops/nussinov.py):
//   1. down  [i+1, j]                 (span >= 2)
//   2. left  [i, j-1]                 (span >= 2)
//   3. pair  [i+1, j-1] + sm[i, j]    (span >= 3, sm > 0)
//   4. split k pairing j: [i, k-1] + pv[j, k], spans j-k ascending
// pv is a dense cache of the "k pairs j" candidate values (the device
// kernel's end-major M buffer, ops/nussinov_pallas.py), replacing any
// list-based bookkeeping: pv[j, k] = dp[k+1, j-1] + sm[k, j] when positive.
float sparse_nussinov_decode(const float* sm, int32_t n, int32_t* pair_of)
{
    const float NONE = -3e38f;
    const size_t nn = (size_t)n * n;
    std::vector<float> dp(nn, 0.0f);
    std::vector<float> pv(nn, NONE);
    std::vector<uint8_t> op(nn, 0);   // 0 empty, 1 down, 2 left, 3 pair, 4 split
    std::vector<int32_t> ks(nn, -1);  // split point when op == 4

    for (int s = 1; s < n; ++s)
    {
        for (int i = 0, j = s; j < n; ++i, ++j)
        {
            const size_t at = (size_t)i * n + j;
            float best = NONE;
            uint8_t o = 0;
            int32_t kb = -1;
            if (s >= 2)
            {
                best = dp[at + n];  // down: [i+1, j]
                o = 1;
                const float lf = dp[at - 1];  // left: [i, j-1]
                if (lf > best) { best = lf; o = 2; }
            }
            if (s >= 3 && sm[at] > 0.0f)
            {
                const float m = dp[at + n - 1] + sm[at];  // [i+1, j-1] + s
                pv[(size_t)j * n + i] = m;
                if (m > best) { best = m; o = 3; }
            }
            // splits, smallest span (j - k) first
            for (int k = j - 3; k > i; --k)
            {
                const float m = pv[(size_t)j * n + k];
                if (m == NONE) continue;
                const float c = dp[(size_t)i * n + (k - 1)] + m;
                if (c > best) { best = c; o = 4; kb = k; }
            }
            if (best > NONE)
            {
                dp[at] = best;
                op[at] = o;
                ks[at] = kb;
            }
        }
    }

    for (int i = 0; i < n; ++i) pair_of[i] = -1;
    std::vector<std::pair<int32_t, int32_t>> todo;
    todo.push_back({0, n - 1});
    while (!todo.empty())
    {
        const auto [i, j] = todo.back();
        todo.pop_back();
        if (j <= i) continue;
        const size_t at = (size_t)i * n + j;
        switch (op[at])
        {
        case 1: todo.push_back({i + 1, j}); break;
        case 2: todo.push_back({i, j - 1}); break;
        case 3:
            pair_of[i] = j;
            todo.push_back({i + 1, j - 1});
            break;
        case 4:
        {
            const int32_t k = ks[at];
            pair_of[k] = j;
            todo.push_back({i, k - 1});
            todo.push_back({k + 1, j - 1});
            break;
        }
        default: break;
        }
    }
    return dp[(size_t)n - 1];
}

// Banded MEA alignment decode.  sm: row-major n1 x n2 float32 cell scores;
// band: (n1+1) x 2 int64 [first, last] per DP row (ops/nw.envelope).
// Fills al (int32 length n1, -1 = gap); returns dp[n1][n2].
//
// Scalar form of ops/nw.py _decode_impl: per row, b = max(diag, up) with
// ties to diag; the in-row left dependency is a running maximum seeded with
// dp[i][first-1] (0 if first == 1, unreachable otherwise), and the left move
// wins only on strictly greater.
float sparse_nw_decode(const float* sm, int32_t n1, int32_t n2,
                       const int64_t* band, int32_t* al)
{
    const float UNSEEN = std::numeric_limits<float>::lowest();
    const size_t W = (size_t)n2 + 1;
    enum : uint8_t { NONE = 0, DIAG = 1, UP = 2, LEFT = 3 };
    std::vector<uint8_t> mv((size_t)(n1 + 1) * W, NONE);
    std::vector<float> prev(W, 0.0f), cur(W, UNSEEN);

    for (int k = 1; k <= n2; ++k) mv[k] = LEFT;  // row 0

    for (int i = 1; i <= n1; ++i)
    {
        const int64_t first = band[2 * i] > 1 ? band[2 * i] : 1;
        const int64_t last = band[2 * i + 1];
        cur.assign(W, UNSEEN);
        cur[0] = 0.0f;
        mv[(size_t)i * W] = UP;
        float run = (first == 1) ? 0.0f : UNSEEN;
        for (int64_t k = first; k <= last; ++k)
        {
            const float dg = prev[k - 1] + sm[(size_t)(i - 1) * n2 + (k - 1)];
            const float up = prev[k];
            float b;
            uint8_t c;
            if (dg >= up) { b = dg; c = DIAG; }
            else          { b = up; c = UP; }
            if (run > b) { b = run; c = LEFT; }
            cur[k] = b;
            mv[(size_t)i * W + k] = c;
            run = b;
        }
        prev.swap(cur);
    }
    const float score = prev[n2];

    for (int i = 0; i < n1; ++i) al[i] = -1;
    int i = n1, k = n2;
    while (i > 0 || k > 0)
    {
        const uint8_t c = mv[(size_t)i * W + k];
        if (c == DIAG)    { al[i - 1] = k - 1; --i; --k; }
        else if (c == UP) { al[i - 1] = -1; --i; }
        else              { --k; }
    }
    return score;
}

}  // extern "C"
