// Native frame preprocessing: BGR -> grey with integer decimation.
//
// The pipeline's pass 1 ships one grey byte per (downscaled) pixel to the
// device instead of three full-resolution BGR bytes — the host->device link
// is the scarce resource (it burst-throttles on sustained volume), while
// this conversion is a trivial streaming loop. NumPy is two orders of
// magnitude too slow for it on a weak host core (strided reads + float
// temporaries); this is the tier the reference delegates to OpenCV's C++
// (cv2.cvtColor, processor.py:314,357), built first-party here.
//
// BT.601 luma in 8.8 fixed point: (29 B + 150 G + 77 R) >> 8 — matches the
// float formula to within 1 LSB.

#include <cstddef>
#include <cstdint>

extern "C" {

// in:  (t, h, w, 3) uint8 BGR, C-contiguous
// out: (t, h/s, w/s) uint8 grey (point-sampled every s-th pixel)
void bgr_grey_down(const uint8_t* in, uint8_t* out, long t, long h, long w,
                   long s) {
  const long oh = h / s, ow = w / s;
  for (long f = 0; f < t; ++f) {
    const uint8_t* fp = in + (size_t)f * h * w * 3;
    uint8_t* op = out + (size_t)f * oh * ow;
    for (long y = 0; y < oh; ++y) {
      const uint8_t* row = fp + (size_t)(y * s) * w * 3;
      uint8_t* orow = op + (size_t)y * ow;
      for (long x = 0; x < ow; ++x) {
        const uint8_t* p = row + (size_t)(x * s) * 3;
        orow[x] = (uint8_t)((29 * p[0] + 150 * p[1] + 77 * p[2]) >> 8);
      }
    }
  }
}

}  // extern "C"
