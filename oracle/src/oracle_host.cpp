// oracle_host: DISCLOSED REFERENCE-MIRROR TEST ORACLES — NOT part of the
// shipped dafs_tpu package.  These scalar routines intentionally mirror the
// reference C++ line-for-line so that tests can pin the TPU kernels and the
// independently-written production host decoders (dafs_tpu/native) bit-for-bit
// against the reference's exact float32 semantics:
//   - SparseNussinov MEA decode      (mirror of src/nussinov.cpp:207-298)
//   - banded NW decode + envelope    (mirror of src/needleman_wunsch.cpp:198-422)
//   - similarity DP                  (mirror of src/dafs.cpp:713-764)
//   - scalar ProbCons pair-HMM       (mirror of probconsRNA/ProbabilisticModel.h;
//     also the measured single-core C++ baseline for bench.py)
// Consumed only by tests/ and bench.py, never imported by dafs_tpu.
//
// C ABI, consumed through ctypes (no pybind11 dependency).

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>
#include <limits>
#include <cmath>

extern "C" {

// MEA Nussinov with anchored candidate lists; sm is row-major LxL float32.
// Returns dp[0][L-1]; fills ss (int32 length L, -1 = unpaired).
float sparse_nussinov_decode(const float* sm, int32_t L, int32_t* ss)
{
    std::vector<float> dp((size_t)L * L, 0.0f);
    std::vector<int32_t> tr((size_t)L * L, 0);
    std::vector<std::vector<std::pair<int32_t, float>>> bp(L);

    auto DP = [&](int i, int j) -> float& { return dp[(size_t)i * L + j]; };
    auto TR = [&](int i, int j) -> int32_t& { return tr[(size_t)i * L + j]; };

    for (int l = 1; l < L; ++l)
    {
        for (int i = 0; i + l < L; ++i)
        {
            int j = i + l;
            float v = 0.0f;
            int t = 0;
            if (i + 1 < j) { v = DP(i + 1, j); t = 1; }
            if (i < j - 1 && v < DP(i, j - 1)) { v = DP(i, j - 1); t = 2; }
            if (i + 1 < j - 1)
            {
                float s = sm[(size_t)i * L + j];
                if (s > 0.0f)
                {
                    bp[j].push_back({i, DP(i + 1, j - 1) + s});
                    if (v < DP(i + 1, j - 1) + s) { v = DP(i + 1, j - 1) + s; t = 3; }
                }
            }
            for (const auto& x : bp[j])
            {
                int k = x.first;
                float s = x.second;
                if (i < k && v < DP(i, k - 1) + s) { v = DP(i, k - 1) + s; t = k - i + 3; }
            }
            DP(i, j) = v;
            TR(i, j) = t;
        }
    }

    for (int i = 0; i < L; ++i) ss[i] = -1;
    std::vector<std::pair<int, int>> st;
    st.push_back({0, L - 1});
    while (!st.empty())
    {
        auto [i, j] = st.back();
        st.pop_back();
        int t = TR(i, j);
        switch (t)
        {
        case 0: break;
        case 1: st.push_back({i + 1, j}); break;
        case 2: st.push_back({i, j - 1}); break;
        case 3: ss[i] = j; st.push_back({i + 1, j - 1}); break;
        default:
        {
            int k = i + t - 3;
            st.push_back({i, k - 1});
            ss[k] = j;
            st.push_back({k + 1, j - 1});
            break;
        }
        }
    }
    return DP(0, L - 1);
}

// Alignment envelope (initialize(), needleman_wunsch.cpp:198-253).
// p row-major L1xL2; env output (L1+1) x 2 int64 [first, last].
void nw_envelope(const float* p, int32_t L1, int32_t L2, float th, int64_t* env)
{
    for (int i = 0; i <= L1; ++i) { env[2 * i] = 0; env[2 * i + 1] = 0; }
    for (int i = 1; i <= L1; ++i)
    {
        int first = 0;
        for (int k = 1; k <= L2; ++k)
            if (p[(size_t)(i - 1) * L2 + (k - 1)] - th >= 0.0f)
            {
                env[2 * (i - 1)] = std::min(env[2 * (i - 1)], (int64_t)(k - 1));
                env[2 * i] = k;
                first = k;
                break;
            }
        if (first == 0)
        {
            env[2 * i] = env[2 * (i - 1)];
            env[2 * i + 1] = env[2 * (i - 1) + 1];
            continue;
        }
        for (int k = L2; k >= 1; --k)
            if (p[(size_t)(i - 1) * L2 + (k - 1)] - th >= 0.0f)
            {
                env[2 * (i - 1) + 1] = std::max(env[2 * (i - 1) + 1], (int64_t)(k - 1));
                env[2 * i + 1] = k;
                break;
            }
    }
    env[2 * L1 + 1] = L2;
    {
        int64_t v = L2;
        for (int i = L1; i >= 1; --i) { v = std::min(v, env[2 * i]); env[2 * i] = v; }
    }
    {
        int64_t v = 0;
        for (int i = 0; i <= L1; ++i) { v = std::max(v, env[2 * i + 1]); env[2 * i + 1] = v; }
    }
    for (int i = 1; i <= L1; ++i)
        if (env[2 * (i - 1) + 1] < env[2 * i]) env[2 * i] = env[2 * (i - 1) + 1];
}

// Banded MEA NW decode; sm row-major L1xL2 cell scores; env as above.
// Fills al (int32 length L1, -1 = gap). Returns dp[L1][L2].
float sparse_nw_decode(const float* sm, int32_t L1, int32_t L2,
                       const int64_t* env, int32_t* al)
{
    const float LOWEST = std::numeric_limits<float>::lowest();
    std::vector<float> dp((size_t)(L1 + 1) * (L2 + 1), LOWEST);
    std::vector<char> tr((size_t)(L1 + 1) * (L2 + 1), ' ');
    auto DP = [&](int i, int k) -> float& { return dp[(size_t)i * (L2 + 1) + k]; };
    auto TRc = [&](int i, int k) -> char& { return tr[(size_t)i * (L2 + 1) + k]; };

    DP(0, 0) = 0.0f;
    for (int i = 1; i <= L1; ++i) { DP(i, 0) = 0.0f; TRc(i, 0) = 'X'; }
    for (int k = 1; k <= L2; ++k) { DP(0, k) = 0.0f; TRc(0, k) = 'Y'; }

    for (int i = 1; i <= L1; ++i)
    {
        for (int64_t k = env[2 * i]; k <= env[2 * i + 1]; ++k)
        {
            if (k == 0) continue;
            float v = DP(i - 1, k - 1) + sm[(size_t)(i - 1) * L2 + (k - 1)];
            char t = 'M';
            if (v < DP(i - 1, k)) { v = DP(i - 1, k); t = 'X'; }
            if (v < DP(i, k - 1)) { v = DP(i, k - 1); t = 'Y'; }
            DP(i, k) = v;
            TRc(i, k) = t;
        }
    }

    for (int i = 0; i < L1; ++i) al[i] = -1;
    int i = L1, k = L2;
    std::vector<char> rpath;
    while (i > 0 || k > 0)
    {
        char t = TRc(i, k);
        rpath.push_back(t);
        if (t == 'M') { --i; --k; }
        else if (t == 'X') { --i; }
        else { --k; }
    }
    int ii = 0, kk = 0;
    for (auto it = rpath.rbegin(); it != rpath.rend(); ++it)
    {
        if (*it == 'M') { al[ii++] = kk++; }
        else if (*it == 'X') { al[ii++] = -1; }
        else { ++kk; }
    }
    return DP(L1, L2);
}

// Similarity DP (calculate_similarity_score, src/dafs.cpp:713-764).
// mp row-major L1xL2 dense (0 = absent entry). Returns dp/tr ratio.
float similarity_score(const float* mp, int32_t L1, int32_t L2)
{
    std::vector<float> dp((size_t)(L1 + 1) * (L2 + 1), 0.0f);
    std::vector<int32_t> tr((size_t)(L1 + 1) * (L2 + 1), 0);
    auto DP = [&](int i, int j) -> float& { return dp[(size_t)i * (L2 + 1) + j]; };
    auto TR = [&](int i, int j) -> int32_t& { return tr[(size_t)i * (L2 + 1) + j]; };

    for (int i = 1; i <= L1; ++i)
    {
        int j = 1;
        for (int jj = 0; jj < L2; ++jj)
        {
            float pv = mp[(size_t)(i - 1) * L2 + jj];
            if (pv == 0.0f) continue;
            for (; j - 1 < jj; ++j)
            {
                DP(i, j) = DP(i, j - 1);
                TR(i, j) = TR(i, j - 1) + 1;
                if (DP(i, j) < DP(i - 1, j)) { DP(i, j) = DP(i - 1, j); TR(i, j) = TR(i - 1, j) + 1; }
            }
            DP(i, j) = DP(i - 1, j - 1) + pv;
            TR(i, j) = TR(i - 1, j - 1) + 1;
            if (DP(i, j) < DP(i, j - 1)) { DP(i, j) = DP(i, j - 1); TR(i, j) = TR(i, j - 1) + 1; }
            if (DP(i, j) < DP(i - 1, j)) { DP(i, j) = DP(i - 1, j); TR(i, j) = TR(i - 1, j) + 1; }
            ++j;
        }
        for (; j <= L2; ++j)
        {
            DP(i, j) = DP(i, j - 1);
            TR(i, j) = TR(i, j - 1) + 1;
            if (DP(i, j) < DP(i - 1, j)) { DP(i, j) = DP(i - 1, j); TR(i, j) = TR(i - 1, j) + 1; }
        }
    }
    return DP(L1, L2) / (float)TR(L1, L2);
}


// ---------------------------------------------------------------------------
// ProbCons pair-HMM: scalar forward/backward/posterior.
//
// Mirror of probconsRNA/ProbabilisticModel.h:105-259,337-403 with the
// ScoreType.h:18-19,37-57,186-263 piecewise-polynomial LOG_ADD / EXP
// approximations (same coefficients as dafs_tpu/ops/logspace.py).  Two roles:
//   1. the *measured* single-core C++ baseline for bench.py (the reference
//      publishes no numbers; this is the same DP at native scalar speed);
//   2. an independent native oracle for the batched TPU kernels at any L.
// Parameter tables are passed in from Python (models/probcons_params.py).
// ---------------------------------------------------------------------------

static inline float pc_poly3(float x, float a, float b, float c, float d)
{
    return ((a * x + b) * x + c) * x + d;
}

static inline float pc_poly4(float x, float a, float b, float c, float d, float e)
{
    return (((a * x + b) * x + c) * x + d) * x + e;
}

static const float PC_LOG_ZERO = -2e20f;

static inline float pc_lookup(float x)  // log(exp(x)+1), 0 <= x <= 7.5
{
    if (x <= 1.0f)
        return pc_poly3(x, -0.009350833524763f, 0.130659527668286f,
                        0.498799810682272f, 0.693203116424741f);
    if (x <= 2.5f)
        return pc_poly3(x, -0.014532321752540f, 0.139942324101744f,
                        0.495635523139337f, 0.692140569840976f);
    if (x <= 4.5f)
        return pc_poly3(x, -0.004605031767994f, 0.063427417320019f,
                        0.695956496475118f, 0.514272634594009f);
    return pc_poly3(x, -0.000458661602210f, 0.009695946122598f,
                    0.930734667215156f, 0.168037164329057f);
}

static inline float pc_logadd(float x, float y)
{
    float hi = x < y ? y : x;
    float lo = x < y ? x : y;
    float d = hi - lo;
    if (lo == PC_LOG_ZERO || d >= 7.5f) return hi;
    return pc_lookup(d) + lo;
}

static inline float pc_exp(float x)  // ScoreType.h EXP, piecewise quartic
{
    if (x > 0.0f) return expf(x);
    if (x > -0.5f)
        return pc_poly4(x, 0.03254409303190190000f, 0.16280432765779600000f,
                        0.49929760485974900000f, 0.99995149601363700000f,
                        0.99999925508501600000f);
    if (x > -1.0f)
        return pc_poly4(x, 0.01973899026052090000f, 0.13822379685007000000f,
                        0.48056651562365000000f, 0.99326940370383500000f,
                        0.99906756856399500000f);
    if (x > -2.0f)
        return pc_poly4(x, 0.00940528203591384000f, 0.09414963667859410000f,
                        0.40825793595877300000f, 0.93933625499130400000f,
                        0.98369508190545300000f);
    if (x > -4.0f)
        return pc_poly4(x, 0.00217245711583303000f, 0.03484829428350620000f,
                        0.22118199801337800000f, 0.67049462206469500000f,
                        0.83556950223398500000f);
    if (x > -8.0f)
        return pc_poly4(x, 0.00012398771025456900f, 0.00349155785951272000f,
                        0.03727721426017900000f, 0.17974997741536900000f,
                        0.33249299994217400000f);
    if (x > -16.0f)
        return pc_poly4(x, 0.00000051741713416603f, 0.00002721456879608080f,
                        0.00053418601865636800f, 0.00464101989351936000f,
                        0.01507447981459420000f);
    return 0.0f;
}

// codes1: (L1+1) int32, 1-based (index 0 unused); init: 3 floats; trans: 3x3
// row-major [from][to] with states 0=M,1=Ix,2=Iy; match: 7x7 log emissions;
// ins: 7 log single emissions.  Fills post (L1 x L2 row-major) with match
// posteriors; returns log total probability.
float pairhmm_posterior(const int32_t* c1, int32_t L1,
                        const int32_t* c2, int32_t L2,
                        const float* init, const float* trans,
                        const float* match, const float* ins,
                        float* post)
{
    const float LZ = PC_LOG_ZERO;
    const size_t W = (size_t)L2 + 1;
    std::vector<float> fm((size_t)(L1 + 1) * W, LZ), fx((size_t)(L1 + 1) * W, LZ),
        fy((size_t)(L1 + 1) * W, LZ);
    auto M = [&](const int32_t* c, int i, int j) {
        return match[(size_t)c1[i] * 7 + c2[j]];
        (void)c;
    };

    for (int i = 0; i <= L1; ++i)
        for (int j = 0; j <= L2; ++j)
        {
            if (i == 0 && j == 0) continue;
            const size_t at = (size_t)i * W + j;
            const bool not_init = (i > 1) || (j > 1);
            if (i > 0 && j > 0)
            {
                if (i == 1 && j == 1)
                    fm[at] = init[0] + M(c1, 1, 1);
                else
                {
                    const size_t d = (size_t)(i - 1) * W + (j - 1);
                    float acc = fm[d] + trans[0 * 3 + 0];
                    acc = pc_logadd(acc, fx[d] + trans[1 * 3 + 0]);
                    acc = pc_logadd(acc, fy[d] + trans[2 * 3 + 0]);
                    fm[at] = acc + M(c1, i, j);
                }
            }
            if (i == 1 && j == 0)
                fx[at] = init[1] + ins[c1[1]];
            else if (i > 0 && not_init)
            {
                const size_t u = (size_t)(i - 1) * W + j;
                fx[at] = ins[c1[i]] +
                         pc_logadd(fm[u] + trans[0 * 3 + 1], fx[u] + trans[1 * 3 + 1]);
            }
            if (i == 0 && j == 1)
                fy[at] = init[2] + ins[c2[1]];
            else if (j > 0 && not_init)
            {
                const size_t l = at - 1;
                fy[at] = ins[c2[j]] +
                         pc_logadd(fm[l] + trans[0 * 3 + 2], fy[l] + trans[2 * 3 + 2]);
            }
        }

    std::vector<float> bm((size_t)(L1 + 1) * W, LZ), bx((size_t)(L1 + 1) * W, LZ),
        by((size_t)(L1 + 1) * W, LZ);
    for (int i = L1; i >= 0; --i)
        for (int j = L2; j >= 0; --j)
        {
            const size_t at = (size_t)i * W + j;
            if (i == L1 && j == L2)
            {
                bm[at] = init[0];
                bx[at] = init[1];
                by[at] = init[2];
                continue;
            }
            float vM = LZ, vX = LZ, vY = LZ;
            if (i < L1 && j < L2)
            {
                float pxy = bm[(size_t)(i + 1) * W + (j + 1)] + M(c1, i + 1, j + 1);
                vM = pc_logadd(vM, pxy + trans[0 * 3 + 0]);
                vX = pc_logadd(vX, pxy + trans[1 * 3 + 0]);
                vY = pc_logadd(vY, pxy + trans[2 * 3 + 0]);
            }
            if (i < L1)
            {
                float v = bx[(size_t)(i + 1) * W + j] + ins[c1[i + 1]];
                vM = pc_logadd(vM, v + trans[0 * 3 + 1]);
                vX = pc_logadd(vX, v + trans[1 * 3 + 1]);
            }
            if (j < L2)
            {
                float v = by[at + 1] + ins[c2[j + 1]];
                vM = pc_logadd(vM, v + trans[0 * 3 + 2]);
                vY = pc_logadd(vY, v + trans[2 * 3 + 2]);
            }
            bm[at] = vM;
            bx[at] = vX;
            by[at] = vY;
        }

    const size_t e = (size_t)L1 * W + L2;
    float total_f = fm[e] + bm[e];
    total_f = pc_logadd(total_f, fx[e] + bx[e]);
    total_f = pc_logadd(total_f, fy[e] + by[e]);
    float total_b = fm[W + 1] + bm[W + 1];
    total_b = pc_logadd(total_b, fx[W] + bx[W]);
    total_b = pc_logadd(total_b, fy[1] + by[1]);
    const float total = (total_f + total_b) / 2.0f;

    for (int i = 1; i <= L1; ++i)
        for (int j = 1; j <= L2; ++j)
        {
            const size_t at = (size_t)i * W + j;
            float lp = fm[at] + bm[at] - total;
            post[(size_t)(i - 1) * L2 + (j - 1)] = pc_exp(lp < 0.0f ? lp : 0.0f);
        }
    return total;
}

}  // extern "C"
