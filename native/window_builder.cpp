// Native sliding-window dataset builder.
//
// The reference builds training windows with a Python loop of pandas slices
// (lib/regional_data_builder.py:219-251) — O(n_windows) DataFrame copies.
// For production-scale data (years of daily, 49 regions, ~100 queries) this
// is the slowest part of the host pipeline, so the framework's data path is
// native: one pass over contiguous float32 arrays, OpenMP-free (the driver
// parallelizes across configs/hosts), bound via ctypes.
//
// Layouts (C-order float32):
//   qs  : (n_days, n_regions, n_qs)
//   ili : (n_days, n_regions)
//   out_x: (n_windows, window+lag, n_regions*n_qs + n_regions)
//          per step: [region0 queries | region1 queries | ... | all ILI],
//          trailing `lag` days of the ILI block set to -1 (reporting delay)
//   out_y: (n_windows, y_len, n_regions)
//          y_len = window+1+gamma when run_backward else gamma
// Window b (b in [window+1, n_days-gamma)):
//   inputs cover days [b-window-1, b+lag-1)
//   outputs cover days [b-window-1, b+gamma) or [b, b+gamma)

#include <cstdint>
#include <cstring>

extern "C" {

int64_t n_windows(int64_t n_days, int64_t window_size, int64_t gamma) {
    int64_t n = n_days - gamma - (window_size + 1);
    return n > 0 ? n : 0;
}

void build_windows_f32(
    const float* qs, const float* ili,
    int64_t n_days, int64_t n_regions, int64_t n_qs,
    int64_t window_size, int64_t lag, int64_t gamma,
    int run_backward,
    float* out_x, float* out_y) {

    const int64_t in_len = window_size + lag;
    const int64_t y_len = run_backward ? (window_size + 1 + gamma) : gamma;
    const int64_t feat = n_regions * n_qs + n_regions;
    const int64_t nw = n_windows(n_days, window_size, gamma);

    for (int64_t w = 0; w < nw; ++w) {
        const int64_t b = w + window_size + 1;
        const int64_t in_start = b - window_size - 1;
        float* xw = out_x + w * in_len * feat;

        for (int64_t s = 0; s < in_len; ++s) {
            const int64_t day = in_start + s;
            float* row = xw + s * feat;
            // region-major query blocks
            for (int64_t r = 0; r < n_regions; ++r) {
                const float* src = qs + (day * n_regions + r) * n_qs;
                std::memcpy(row + r * n_qs, src, n_qs * sizeof(float));
            }
            // ILI block; trailing `lag` steps masked to -1
            float* ili_row = row + n_regions * n_qs;
            if (s >= in_len - lag) {
                for (int64_t r = 0; r < n_regions; ++r) ili_row[r] = -1.0f;
            } else {
                std::memcpy(ili_row, ili + day * n_regions,
                            n_regions * sizeof(float));
            }
        }

        const int64_t out_start = run_backward ? in_start : b;
        float* yw = out_y + w * y_len * n_regions;
        std::memcpy(yw, ili + out_start * n_regions,
                    y_len * n_regions * sizeof(float));
    }
}

}  // extern "C"
