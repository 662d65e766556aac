// Multithreaded row gather for the index-pairing data path.
//
// The reference materializes paired datasets through torchnet
// ResampleDataset indirection at __getitem__ time (dataloaders.py:268-275);
// here pairing is a bulk gather at construction: dst[k] = src[idx[k]] over
// hundreds of thousands of image rows (the mnist-svhn train pairing is
// ~300k x 3-12KB). This C++ kernel parallelizes the copy across threads —
// numpy's fancy indexing is single-threaded.
//
// Build: g++ -O3 -march=native -shared -fPIC -pthread gather.cpp -o libgather.so

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

void gather_rows(const char* src, const int64_t* idx, char* dst,
                 int64_t n_idx, int64_t row_bytes, int n_threads) {
    if (n_threads < 1) n_threads = 1;
    auto worker = [&](int64_t lo, int64_t hi) {
        for (int64_t k = lo; k < hi; ++k) {
            std::memcpy(dst + k * row_bytes, src + idx[k] * row_bytes,
                        (size_t)row_bytes);
        }
    };
    if (n_threads == 1 || n_idx < 4096) {
        worker(0, n_idx);
        return;
    }
    std::vector<std::thread> threads;
    int64_t chunk = (n_idx + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int64_t lo = t * chunk;
        int64_t hi = lo + chunk < n_idx ? lo + chunk : n_idx;
        if (lo >= hi) break;
        threads.emplace_back(worker, lo, hi);
    }
    for (auto& th : threads) th.join();
}

// uint8 -> float32 [0,1] conversion fused with the gather: the on-device
// pipeline can also do this, but for host-side assembly it halves the
// number of passes over memory.
void gather_rows_u8_to_f32(const uint8_t* src, const int64_t* idx, float* dst,
                           int64_t n_idx, int64_t row_elems, int n_threads) {
    if (n_threads < 1) n_threads = 1;
    const float scale = 1.0f / 255.0f;
    auto worker = [&](int64_t lo, int64_t hi) {
        for (int64_t k = lo; k < hi; ++k) {
            const uint8_t* s = src + idx[k] * row_elems;
            float* d = dst + k * row_elems;
            for (int64_t j = 0; j < row_elems; ++j) d[j] = s[j] * scale;
        }
    };
    if (n_threads == 1 || n_idx < 4096) {
        worker(0, n_idx);
        return;
    }
    std::vector<std::thread> threads;
    int64_t chunk = (n_idx + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int64_t lo = t * chunk;
        int64_t hi = lo + chunk < n_idx ? lo + chunk : n_idx;
        if (lo >= hi) break;
        threads.emplace_back(worker, lo, hi);
    }
    for (auto& th : threads) th.join();
}

}  // extern "C"
