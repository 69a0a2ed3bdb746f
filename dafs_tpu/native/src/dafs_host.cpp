// dafs_host: native host-side kernels for DAFS-TPU.
//
// The TPU path (JAX/Pallas) carries the heavy batched DP work; this library
// provides native-performance implementations of the *sequential* host-side
// pieces where Python would be a slow stand-in and where exact float32
// semantics of the reference matter:
//   - SparseNussinov MEA decode      (mirror of src/nussinov.cpp:207-298)
//   - banded NW decode + envelope    (mirror of src/needleman_wunsch.cpp:198-422)
//   - similarity DP                  (mirror of src/dafs.cpp:713-764)
// These serve as bit-exact oracles for the device kernels at any length and
// as fast fallbacks for host-mode solves.
//
// C ABI, consumed through ctypes (no pybind11 dependency).

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>
#include <limits>

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

}  // extern "C"
