// libvapaudio — native audio IO + DSP for the data-loader hot path.
//
// The reference delegates audio decode/resample to torchaudio's bundled
// sox/ffmpeg C++ (vap/audio.py:39-69). This library is the TPU framework's
// native equivalent: WAV parsing (PCM16/24/32/float32), polyphase FIR
// resampling (windowed-sinc, scipy.resample_poly-compatible layout), and
// int16 deinterleaving for the real-time SDS capture path. Exposed as a
// C ABI consumed via ctypes (utils/native.py); the Python layer falls back
// to scipy when the shared object is absent.
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>
#include <thread>

namespace {

struct WavInfo {
  int sample_rate = 0;
  int channels = 0;
  int bits = 0;
  int format = 0;  // 1 = PCM, 3 = IEEE float
  long n_frames = 0;
  long data_offset = 0;
};

bool parse_wav_header(FILE* f, WavInfo* info) {
  char riff[4], wave[4];
  uint32_t riff_size;
  if (fread(riff, 1, 4, f) != 4 || memcmp(riff, "RIFF", 4) != 0) return false;
  if (fread(&riff_size, 4, 1, f) != 1) return false;
  if (fread(wave, 1, 4, f) != 4 || memcmp(wave, "WAVE", 4) != 0) return false;

  bool have_fmt = false;
  while (true) {
    char id[4];
    uint32_t size;
    if (fread(id, 1, 4, f) != 4 || fread(&size, 4, 1, f) != 1) break;
    if (memcmp(id, "fmt ", 4) == 0) {
      uint16_t fmt, ch;
      uint32_t sr, byte_rate;
      uint16_t block_align, bits;
      // every field checked: a truncated fmt chunk must fail the parse,
      // not leave ch/sr/bits uninitialized
      if (fread(&fmt, 2, 1, f) != 1 || fread(&ch, 2, 1, f) != 1 ||
          fread(&sr, 4, 1, f) != 1 || fread(&byte_rate, 4, 1, f) != 1 ||
          fread(&block_align, 2, 1, f) != 1 || fread(&bits, 2, 1, f) != 1)
        return false;
      if (fmt == 0xFFFE && size >= 40) {  // WAVE_FORMAT_EXTENSIBLE
        uint16_t cb;
        fread(&cb, 2, 1, f);
        uint16_t valid_bits;
        uint32_t mask;
        uint16_t subfmt;
        fread(&valid_bits, 2, 1, f);
        fread(&mask, 4, 1, f);
        fread(&subfmt, 2, 1, f);
        fmt = subfmt;
        fseek(f, (long)size - 2 - 16 - 8, SEEK_CUR);
      } else if (size > 16) {
        fseek(f, (long)size - 16, SEEK_CUR);
      }
      info->format = fmt;
      info->channels = ch;
      info->sample_rate = (int)sr;
      info->bits = bits;
      have_fmt = true;
    } else if (memcmp(id, "data", 4) == 0) {
      info->data_offset = ftell(f);
      // a fmt chunk declaring 0 channels/bits/rate would make callers
      // divide by zero (SIGFPE kills the whole process) — treat as parse
      // failure so the Python layer falls back / errors cleanly
      if (!have_fmt || info->channels <= 0 || info->bits < 8 ||
          info->sample_rate <= 0)
        return false;
      info->n_frames = (long)size / (info->channels * info->bits / 8);
      return true;
    } else {
      fseek(f, (long)(size + (size & 1)), SEEK_CUR);
    }
  }
  return false;
}

inline float i24_to_f(const uint8_t* p) {
  int32_t v = (int32_t)((uint32_t)p[0] | ((uint32_t)p[1] << 8) |
                        ((uint32_t)p[2] << 16));
  if (v & 0x800000) v |= (int32_t)0xFF000000;  // sign extend
  return (float)v / 8388608.0f;
}

// ---------------------------------------------------------------------------
// polyphase resampling (scipy.signal.resample_poly compatible)
// ---------------------------------------------------------------------------
double bessel_i0(double x) {
  // series expansion; converges fast for the beta range we use
  double sum = 1.0, term = 1.0;
  double x2 = x * x / 4.0;
  for (int k = 1; k < 64; ++k) {
    term *= x2 / (double)(k * k);
    sum += term;
    if (term < 1e-18 * sum) break;
  }
  return sum;
}

// firwin(numtaps, cutoff, window=("kaiser", beta)) with scale=True
std::vector<double> design_lowpass(int numtaps, double cutoff, double beta) {
  std::vector<double> h(numtaps);
  double m = (numtaps - 1) / 2.0;
  double i0b = bessel_i0(beta);
  for (int n = 0; n < numtaps; ++n) {
    double x = n - m;
    double sinc = (x == 0.0) ? cutoff : std::sin(M_PI * cutoff * x) / (M_PI * x);
    double r = 2.0 * n / (numtaps - 1) - 1.0;
    double w = bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - r * r))) / i0b;
    h[n] = sinc * w;
  }
  // scale: unit gain at DC
  double s = 0.0;
  for (double v : h) s += v;
  for (double& v : h) v /= s;
  return h;
}

}  // namespace

extern "C" {

// ---- info ----------------------------------------------------------------
int vap_wav_info(const char* path, int* sample_rate, int* channels,
                 long* n_frames, int* bits) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  bool ok = parse_wav_header(f, &info);
  fclose(f);
  if (!ok) return -2;
  *sample_rate = info.sample_rate;
  *channels = info.channels;
  *n_frames = info.n_frames;
  *bits = info.bits;
  return 0;
}

// ---- read ----------------------------------------------------------------
// Reads [start_frame, start_frame + max_frames) into out (interleaved f32,
// caller-allocated max_frames * channels). Returns frames read, < 0 on error.
long vap_wav_read(const char* path, long start_frame, long max_frames,
                  float* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (!parse_wav_header(f, &info)) {
    fclose(f);
    return -2;
  }
  long avail = info.n_frames - start_frame;
  long n = std::max(0L, std::min(max_frames, avail));
  int ch = info.channels;
  int bytes = info.bits / 8;
  fseek(f, info.data_offset + start_frame * ch * bytes, SEEK_SET);

  const long total = n * ch;
  std::vector<uint8_t> buf((size_t)total * bytes);
  size_t got = fread(buf.data(), bytes, (size_t)total, f);
  fclose(f);
  long got_frames = (long)(got / ch);

  const uint8_t* p = buf.data();
  if (info.format == 3 && info.bits == 32) {
    memcpy(out, p, (size_t)got * 4);
  } else if (info.bits == 16) {
    const int16_t* s = (const int16_t*)p;
    for (long i = 0; i < (long)got; ++i) out[i] = (float)s[i] / 32768.0f;
  } else if (info.bits == 24) {
    for (long i = 0; i < (long)got; ++i) out[i] = i24_to_f(p + i * 3);
  } else if (info.bits == 32) {
    const int32_t* s = (const int32_t*)p;
    for (long i = 0; i < (long)got; ++i)
      out[i] = (float)s[i] / 2147483648.0f;
  } else if (info.bits == 8) {
    for (long i = 0; i < (long)got; ++i)
      out[i] = ((float)p[i] - 128.0f) / 128.0f;
  } else {
    return -3;
  }
  return got_frames;
}

// ---- resample ------------------------------------------------------------
// Polyphase up/down resampling of `ch` parallel channels (channel-major,
// i.e. in[c * n_in + t]). out must hold ch * ceil(n_in * up / down).
// Matches scipy.signal.resample_poly (kaiser 5.0, half_len 10*max(up,down)).
long vap_resample_poly(const float* in, long n_in, int ch, int up, int down,
                       float* out) {
  if (up == down) {
    memcpy(out, in, sizeof(float) * (size_t)n_in * ch);
    return n_in;
  }
  int max_rate = std::max(up, down);
  int half_len = 10 * max_rate;
  int numtaps = 2 * half_len + 1;
  double cutoff = 1.0 / (double)max_rate;
  std::vector<double> h_d = design_lowpass(numtaps, cutoff, 5.0);
  std::vector<float> h(numtaps);
  for (int i = 0; i < numtaps; ++i) h[i] = (float)(h_d[i] * up);

  long n_out = (n_in * (long)up + down - 1) / down;

  auto work = [&](int c) {
    const float* x = in + (size_t)c * n_in;
    float* y = out + (size_t)c * n_out;
    // upfirdn with output trimmed by the filter group delay (half_len):
    // y[m] = sum_k h[m*down + half_len - k*up] * x[k]
    for (long m = 0; m < n_out; ++m) {
      long pos = m * (long)down + half_len;
      long k_lo = (pos - (numtaps - 1) + up - 1) / up;  // ceil
      if (k_lo < 0) k_lo = 0;
      long k_hi = pos / up;
      if (k_hi >= n_in) k_hi = n_in - 1;
      float acc = 0.0f;
      for (long k = k_lo; k <= k_hi; ++k) {
        acc += h[pos - k * up] * x[k];
      }
      y[m] = acc;
    }
  };

  if (ch > 1) {
    std::vector<std::thread> threads;
    for (int c = 0; c < ch; ++c) threads.emplace_back(work, c);
    for (auto& t : threads) t.join();
  } else {
    work(0);
  }
  return n_out;
}

// ---- SDS capture helpers -------------------------------------------------
// Interleaved int16 stereo -> two channel-major float rows (sds ring path,
// reference run_sds.py:206-212).
void vap_deinterleave_i16(const int16_t* in, long n_frames, int channels,
                          float* out) {
  for (int c = 0; c < channels; ++c) {
    float* dst = out + (size_t)c * n_frames;
    const int16_t* src = in + c;
    for (long i = 0; i < n_frames; ++i) {
      dst[i] = (float)src[i * channels] / 32768.0f;
    }
  }
}

// ---- run-length encoding (event-extraction primitive) --------------------
// RLE of an int32 array: fills starts/durations/values (caller-allocated,
// capacity n). Returns number of runs.
long vap_rle_i32(const int32_t* x, long n, int32_t* starts, int32_t* durs,
                 int32_t* vals) {
  if (n <= 0) return 0;
  long r = 0;
  long start = 0;
  for (long i = 1; i <= n; ++i) {
    if (i == n || x[i] != x[start]) {
      starts[r] = (int32_t)start;
      durs[r] = (int32_t)(i - start);
      vals[r] = x[start];
      ++r;
      start = i;
    }
  }
  return r;
}

}  // extern "C"
