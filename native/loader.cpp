// tpuseg native batch loader: GIL-free gather from memory-mapped datasets.
//
// The packed dataset format (tools/pack_dataset.py) stores pre-decoded
// uint8 samples in .npy memmaps; batch assembly is then pure memcpy. Doing
// the gather in one native call (a) releases the GIL for the whole batch so
// the producer thread never contends with the consumer on the one-core
// host, and (b) replaces a Python per-sample loop (memmap slice -> np.array
// copy -> buffer store) with straight memcpy at memory bandwidth.
//
// The reference's counterpart is torch's DataLoader collate running in
// worker processes (main.py:90-95) — C++ under the hood there too.

#include <cstdint>
#include <cstring>

extern "C" {

// Gather n samples of sample_bytes each from src (the memmapped array's
// data pointer) at the given indices into the contiguous out buffer.
// Returns the number of samples copied (== n; signature allows growth).
int64_t tpuseg_gather(const uint8_t* src, int64_t sample_bytes,
                      const int64_t* indices, int64_t n, uint8_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    std::memcpy(out + i * sample_bytes, src + indices[i] * sample_bytes,
                static_cast<size_t>(sample_bytes));
  }
  return n;
}

// Paired image+mask gather (one call per batch instead of two).
int64_t tpuseg_gather2(const uint8_t* img_src, int64_t img_bytes,
                       const uint8_t* msk_src, int64_t msk_bytes,
                       const int64_t* indices, int64_t n,
                       uint8_t* img_out, uint8_t* msk_out) {
  for (int64_t i = 0; i < n; ++i) {
    const int64_t idx = indices[i];
    std::memcpy(img_out + i * img_bytes, img_src + idx * img_bytes,
                static_cast<size_t>(img_bytes));
    std::memcpy(msk_out + i * msk_bytes, msk_src + idx * msk_bytes,
                static_cast<size_t>(msk_bytes));
  }
  return n;
}

}  // extern "C"
