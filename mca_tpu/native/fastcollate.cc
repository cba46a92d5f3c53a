// Native host-side collation kernels.
//
// The collators (mca_tpu/data/collators.py) right-pad variable-length
// per-sample arrays into fixed-shape batches — a pure memory-movement
// loop that Python executes per sample per field.  On the single-core
// hosts driving a TPU that loop competes with dispatch; these C
// routines do the whole batch in one call.  Loaded via ctypes
// (mca_tpu/native/__init__.py), with a numpy fallback when the
// toolchain is unavailable.
//
// Conventions match the reference collators (ref encoders.py:286-364):
// pad value fills the tail, attention mask is 1/true = padded.

#include <cstdint>
#include <cstring>

extern "C" {

// 1-D rows -> [n_rows, pad_len] f32 + equality-derived padding mask
// (mask[i,j] = out[i,j] == pad_value, ref encoders.py:307: the mask is
// computed AFTER padding, so data values equal to the pad token are
// masked too).
void pad_rows_f32(const float** rows, const int64_t* lens,
                  int64_t n_rows, int64_t pad_len, float pad_value,
                  float* out, int64_t* mask_out) {
  for (int64_t i = 0; i < n_rows; ++i) {
    float* dst = out + i * pad_len;
    const int64_t n = lens[i] < pad_len ? lens[i] : pad_len;
    if (rows[i] != nullptr && n > 0) {
      std::memcpy(dst, rows[i], n * sizeof(float));
    }
    for (int64_t j = n; j < pad_len; ++j) dst[j] = pad_value;
    if (mask_out != nullptr) {
      int64_t* m = mask_out + i * pad_len;
      for (int64_t j = 0; j < pad_len; ++j) m[j] = dst[j] == pad_value;
    }
  }
}

// 1-D rows -> [n_rows, pad_len] f32 with a constant fill (no mask);
// used for the secondary 'data' column (ref encoders.py:308-310).
void pad_rows_fill_f32(const float** rows, const int64_t* lens,
                       int64_t n_rows, int64_t pad_len, float fill,
                       float* out) {
  for (int64_t i = 0; i < n_rows; ++i) {
    float* dst = out + i * pad_len;
    const int64_t n = lens[i] < pad_len ? lens[i] : pad_len;
    if (rows[i] != nullptr && n > 0) {
      std::memcpy(dst, rows[i], n * sizeof(float));
    }
    for (int64_t j = n; j < pad_len; ++j) dst[j] = fill;
  }
}

// [T_i, width] rows -> [n_rows, pad_len, width] f32 + 1-D length mask
// (mask[i,t] = t >= T_i, ref encoders.py:338-342).  NaN/Inf cleaned to
// 0 in-flight (the reference's nan_to_num pass, ref :335-336).
void pad_seq2d_f32(const float** rows, const int64_t* t_lens,
                   int64_t n_rows, int64_t pad_len, int64_t width,
                   float fill, int clean, float* out, bool* mask_out) {
  for (int64_t i = 0; i < n_rows; ++i) {
    float* dst = out + i * pad_len * width;
    const int64_t t = t_lens[i] < pad_len ? t_lens[i] : pad_len;
    if (rows[i] != nullptr && t > 0) {
      std::memcpy(dst, rows[i], t * width * sizeof(float));
      if (clean) {
        // numpy nan_to_num semantics: NaN -> 0, +-Inf -> +-FLT_MAX
        const float kMax = 3.4028234663852886e38f;
        for (int64_t j = 0; j < t * width; ++j) {
          const float v = dst[j];
          if (!(v == v)) dst[j] = 0.0f;
          else if (v > kMax) dst[j] = kMax;
          else if (v < -kMax) dst[j] = -kMax;
        }
      }
    }
    const int64_t pad_elems = (pad_len - t) * width;
    if (pad_elems > 0) {
      float* tail = dst + t * width;
      for (int64_t j = 0; j < pad_elems; ++j) tail[j] = fill;
    }
    bool* m = mask_out + i * pad_len;
    for (int64_t j = 0; j < pad_len; ++j) m[j] = j >= t;
  }
}

}  // extern "C"
