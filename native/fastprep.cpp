// fastprep: native example builder for the host-side data-prep hot loop.
//
// C++ twin of mtamrecommender_tpu/data/prepare.build_user_examples (itself
// the behavioral port of /root/reference/Prepare/prepare_data_base.py:252-314
// + mask_data_process.py:153-205): for every user and every maskable index,
// emit one fixed-width training row with the windowed history, mask token,
// hour conversion, timelast/timenow features and leave-last-out test routing.
//
// The Python builder walks per-example Python lists (minutes on the larger
// catalogs the reference targets, e.g. tmall/taobao); this walks flat int64
// arrays and writes the packed struct-of-arrays layout directly -- the same
// layout data/pipeline.PackedDataset ships to the device.  Parity with the
// Python path is pinned by tests/test_fastprep.py.
//
// Exposed via a C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// Count examples: one per index 1..len-1 per user (len = offsets[u+1]-offsets[u]).
int64_t fastprep_count(const int64_t* user_offsets, int64_t n_users) {
    int64_t total = 0;
    for (int64_t u = 0; u < n_users; ++u) {
        int64_t len = user_offsets[u + 1] - user_offsets[u];
        if (len >= 2) total += len - 1;
    }
    return total;
}

// Build all examples.
//
// inputs (per-event, label-encoded, per-user time-sorted and deduped):
//   user_ids[n_users], user_offsets[n_users+1], items/cats/stamps[n_events]
//   cat_of_item[item_count]    item -> category (last co-occurrence wins)
// config:
//   max_len        fixed row width (history + mask slot), DataConfig.max_seq_len
//   causality      0 = unidirection, 1 = time_window
//   time_window_s  window size in seconds (causality 1)
//   item_count / category_count   mask token bases
// outputs (pre-allocated, N = fastprep_count(...) rows):
//   out_user[N]          int32
//   out_items[N*max_len] int32   zero-padded
//   out_cats[N*max_len]  int32
//   out_times[N*max_len] float   hours
//   out_tlast[N*max_len] float
//   out_tnow[N*max_len]  float
//   out_pos[N*max_len]   int32
//   out_tid[N], out_tcat[N] int32
//   out_ttime[N]         float
//   out_slen[N]          int32   history + mask slot
//   out_is_test[N]       uint8   1 for the leave-last-out example
// returns the number of rows written (== N), or -1 on bad config.
int64_t fastprep_build(
    const int64_t* user_ids, const int64_t* user_offsets, int64_t n_users,
    const int64_t* items, const int64_t* cats, const int64_t* stamps,
    const int64_t* cat_of_item,
    int64_t max_len, int64_t causality, int64_t time_window_s,
    int64_t item_count, int64_t category_count,
    int32_t* out_user, int32_t* out_items, int32_t* out_cats,
    float* out_times, float* out_tlast, float* out_tnow, int32_t* out_pos,
    int32_t* out_tid, int32_t* out_tcat, float* out_ttime,
    int32_t* out_slen, uint8_t* out_is_test) {
    if (max_len < 2 || (causality != 0 && causality != 1)) return -1;

    int64_t row = 0;
    for (int64_t u = 0; u < n_users; ++u) {
        const int64_t lo = user_offsets[u];
        const int64_t len = user_offsets[u + 1] - lo;
        if (len < 2) continue;
        const int64_t* u_items = items + lo;
        const int64_t* u_cats = cats + lo;
        const int64_t* u_stamps = stamps + lo;

        for (int64_t index = 1; index < len; ++index) {
            // --- window selection (mask_process_unidirectional) ---
            int64_t temp_index = index;
            if (causality == 1) {  // time_window: first event within window
                const int64_t target_time = u_stamps[index];
                for (int64_t i = 0; i <= index; ++i) {
                    if (target_time - u_stamps[i] <= time_window_s) {
                        temp_index = i;
                        break;
                    }
                }
            }
            int64_t start = temp_index - max_len + 1;  // keeps <= max_len-1 events
            if (start < 0) start = 0;
            const int64_t hist = temp_index - start;   // history length
            const int64_t slen = hist + 1;             // + mask slot

            // --- fill one fixed-width row ---
            int32_t* r_items = out_items + row * max_len;
            int32_t* r_cats = out_cats + row * max_len;
            float* r_times = out_times + row * max_len;
            float* r_tlast = out_tlast + row * max_len;
            float* r_tnow = out_tnow + row * max_len;
            int32_t* r_pos = out_pos + row * max_len;
            std::memset(r_items, 0, sizeof(int32_t) * max_len);
            std::memset(r_cats, 0, sizeof(int32_t) * max_len);
            std::memset(r_pos, 0, sizeof(int32_t) * max_len);
            for (int64_t i = 0; i < max_len; ++i) {
                r_times[i] = 0.0f; r_tlast[i] = 0.0f; r_tnow[i] = 0.0f;
            }

            const int64_t target_hour = u_stamps[index] / 3600;  // int hours
            int64_t prev_hour = 0;
            for (int64_t i = 0; i < hist; ++i) {
                const int64_t hour = u_stamps[start + i] / 3600;
                r_items[i] = (int32_t)u_items[start + i];
                r_cats[i] = (int32_t)u_cats[start + i];
                r_times[i] = (float)hour;
                r_tlast[i] = (i == 0) ? 0.0f : (float)(hour - prev_hour);
                r_tnow[i] = (float)(target_hour - hour);
                r_pos[i] = (int32_t)i;
                prev_hour = hour;
            }
            // mask slot (prepare_data_base.py:283-298)
            r_items[hist] = (int32_t)(item_count + 1);
            r_cats[hist] = (int32_t)(category_count + 1);
            r_times[hist] = (float)target_hour;
            r_tlast[hist] = 0.0f;
            r_tnow[hist] = 0.0f;
            r_pos[hist] = (int32_t)std::min(index, max_len - 1);

            out_user[row] = (int32_t)user_ids[u];
            const int64_t tid = u_items[index];
            out_tid[row] = (int32_t)tid;
            out_tcat[row] = (int32_t)cat_of_item[tid];
            out_ttime[row] = (float)target_hour;
            out_slen[row] = (int32_t)slen;
            // leave-last-out: index == len-1 routes to test
            // (prepare_data_base.py:303 quirk, `index == len(mask_index_list)`)
            out_is_test[row] = (index == len - 1) ? 1 : 0;
            ++row;
        }
    }
    return row;
}

}  // extern "C"
