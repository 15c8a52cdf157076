// Native audio ingest for privacy_preserve_federated_asr_tpu.
//
// The reference loads audio with librosa/scipy in Python
// (reference: federated/src/utils.py:126-134) and reports ~7m47s for 1,869
// files (centralized/finetune_ASRs.py:148). This library re-implements that
// ingest path in C++ behind a C ABI consumed via ctypes
// (data/native_audio.py): RIFF/WAV parsing (PCM 8/16/32-bit + IEEE float32,
// any channel count), channel-mean downmix, integer -> [-1, 1] float
// scaling, scipy.signal.resample_poly-equivalent polyphase resampling
// (Kaiser-windowed firwin design, identical padding/trim arithmetic) and
// librosa.util.normalize-style peak normalization — numerically matched to
// the Python loader (tests/test_native_audio.py) — plus a std::thread
// fan-out for whole-corpus loading.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <numeric>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------- wav parse

struct Wav {
  std::vector<float> samples;  // mono, [-1, 1] scaled
  int sample_rate = 0;
};

bool read_file(const char* path, std::vector<uint8_t>& buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n <= 0) { std::fclose(f); return false; }
  buf.resize(static_cast<size_t>(n));
  size_t got = std::fread(buf.data(), 1, buf.size(), f);
  std::fclose(f);
  return got == buf.size();
}

uint32_t rd_u32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) | (static_cast<uint32_t>(p[3]) << 24);
}
uint16_t rd_u16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0]) | (static_cast<uint16_t>(p[1]) << 8);
}

// Parse RIFF/WAVE: locate fmt + data chunks, decode to mono float32.
// Downmix is the CHANNEL MEAN computed in double (scipy path parity:
// data/audio.py sig.mean(axis=1)); integer scaling matches _INT_SCALES
// (int16/32768, int32/2^31, uint8 offset 128 / 128).
bool parse_wav(const std::vector<uint8_t>& b, Wav& out) {
  if (b.size() < 44 || std::memcmp(b.data(), "RIFF", 4) != 0 ||
      std::memcmp(b.data() + 8, "WAVE", 4) != 0)
    return false;
  uint16_t fmt_code = 0, channels = 0, bits = 0;
  uint32_t sr = 0;
  const uint8_t* data = nullptr;
  uint32_t data_len = 0;
  size_t pos = 12;
  while (pos + 8 <= b.size()) {
    const uint8_t* ck = b.data() + pos;
    uint32_t ck_len = rd_u32(ck + 4);
    const uint8_t* body = ck + 8;
    if (pos + 8 + ck_len > b.size()) ck_len = static_cast<uint32_t>(b.size() - pos - 8);
    if (std::memcmp(ck, "fmt ", 4) == 0 && ck_len >= 16) {
      fmt_code = rd_u16(body);
      channels = rd_u16(body + 2);
      sr = rd_u32(body + 4);
      bits = rd_u16(body + 14);
      if (fmt_code == 0xFFFE && ck_len >= 26)  // WAVE_FORMAT_EXTENSIBLE
        fmt_code = rd_u16(body + 24);
    } else if (std::memcmp(ck, "data", 4) == 0) {
      data = body;
      data_len = ck_len;
    }
    pos += 8 + ck_len + (ck_len & 1);  // chunks are word-aligned
  }
  if (!data || channels == 0 || sr == 0) return false;

  size_t bytes_per = bits / 8;
  if (bytes_per == 0) return false;
  size_t frames = data_len / (bytes_per * channels);
  out.samples.resize(frames);
  out.sample_rate = static_cast<int>(sr);

  for (size_t i = 0; i < frames; ++i) {
    double acc = 0.0;
    for (int c = 0; c < channels; ++c) {
      const uint8_t* p = data + (i * channels + c) * bytes_per;
      double v;
      if (fmt_code == 3 && bits == 32) {  // IEEE float
        float f;
        std::memcpy(&f, p, 4);
        v = f;
      } else if (fmt_code == 1 && bits == 16) {
        v = static_cast<int16_t>(rd_u16(p)) / 32768.0;
      } else if (fmt_code == 1 && bits == 32) {
        v = static_cast<int32_t>(rd_u32(p)) / 2147483648.0;
      } else if (fmt_code == 1 && bits == 8) {  // unsigned
        v = (static_cast<double>(p[0]) - 128.0) / 128.0;
      } else if (fmt_code == 1 && bits == 24) {
        int32_t s = (static_cast<int32_t>(p[2]) << 24 |
                     static_cast<int32_t>(p[1]) << 16 |
                     static_cast<int32_t>(p[0]) << 8) >> 8;
        v = s / 8388608.0;
      } else {
        return false;
      }
      acc += v;
    }
    out.samples[i] = static_cast<float>(acc / channels);
  }
  return true;
}

// ------------------------------------------------------- resample (scipy)

double bessel_i0(double x) {
  // power series; converges fast for the beta=5 window range
  double sum = 1.0, term = 1.0;
  double x2 = x * x / 4.0;
  for (int k = 1; k < 64; ++k) {
    term *= x2 / (k * static_cast<double>(k));
    sum += term;
    if (term < 1e-18 * sum) break;
  }
  return sum;
}

// scipy.signal.firwin(numtaps, cutoff, window=("kaiser", 5.0), scale=True)
std::vector<double> firwin_kaiser(int numtaps, double cutoff, double beta) {
  std::vector<double> h(numtaps);
  double alpha = 0.5 * (numtaps - 1);
  double denom = bessel_i0(beta);
  double left = cutoff / 2.0;  // firwin bands: [0, cutoff] of Nyquist=1
  for (int n = 0; n < numtaps; ++n) {
    double m = n - alpha;  // time index centered
    // ideal lowpass: cutoff * sinc(cutoff * m)   (sinc(x)=sin(pi x)/(pi x))
    double s = (m == 0.0) ? cutoff
                          : std::sin(M_PI * cutoff * m) / (M_PI * m);
    double r = 2.0 * (n / static_cast<double>(numtaps - 1)) - 1.0;
    double w = bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - r * r))) / denom;
    h[n] = s * w;
  }
  // scale=True: unit response at the passband center (0 Hz here)
  (void)left;
  double gain = 0.0;
  for (int n = 0; n < numtaps; ++n) gain += h[n];
  for (int n = 0; n < numtaps; ++n) h[n] /= gain;
  return h;
}

size_t upfirdn_len(size_t len_h, size_t n_in, int up, int down) {
  return ((n_in - 1) * up + len_h - 1) / down + 1;  // scipy _output_len
}

// scipy.signal.resample_poly(x, up, down, window=("kaiser", 5.0)) with the
// same filter design, padding and trim arithmetic; accumulation in double
// (scipy promotes float32 x against the float64 filter).
std::vector<float> resample_poly(const std::vector<float>& x, int up, int down) {
  int g = std::gcd(up, down);
  up /= g;
  down /= g;
  if (up == 1 && down == 1) return x;
  size_t n_in = x.size();
  size_t n_out = (n_in * up) / down + ((n_in * up) % down ? 1 : 0);
  int max_rate = std::max(up, down);
  double f_c = 1.0 / max_rate;
  int half_len = 10 * max_rate;
  std::vector<double> h = firwin_kaiser(2 * half_len + 1, f_c, 5.0);
  for (double& v : h) v *= up;
  int n_pre_pad = down - (half_len % down);
  int n_post_pad = 0;
  int n_pre_remove = (half_len + n_pre_pad) / down;
  while (upfirdn_len(h.size() + n_pre_pad + n_post_pad, n_in, up, down) <
         n_out + n_pre_remove)
    ++n_post_pad;
  std::vector<double> hp(n_pre_pad, 0.0);
  hp.insert(hp.end(), h.begin(), h.end());
  hp.insert(hp.end(), n_post_pad, 0.0);

  // Polyphase decomposition: y[j] = sum_m x[t/up - m] * sub[t%up][m] with
  // t = (j + n_pre_remove) * down — each output is a CONTIGUOUS dot product
  // against one phase's subfilter (cache-friendly; the naive per-sample
  // gather over the padded filter measured ~2x slower than scipy's upfirdn).
  long len_h = static_cast<long>(hp.size());
  long sub_len = (len_h + up - 1) / up;
  std::vector<double> sub(static_cast<size_t>(up) * sub_len, 0.0);
  for (long k = 0; k < len_h; ++k)
    sub[(k % up) * sub_len + k / up] = hp[k];

  std::vector<float> y(n_out);
  for (size_t jj = 0; jj < n_out; ++jj) {
    long t = (static_cast<long>(jj) + n_pre_remove) * down;
    long i0 = t / up;          // newest input sample the filter touches
    long p = t - i0 * up;      // phase
    const double* hsub = &sub[p * sub_len];
    long m_lo = std::max<long>(0, i0 - static_cast<long>(n_in) + 1);
    long m_hi = std::min<long>(sub_len - 1, i0);
    double acc = 0.0;
    const float* xi = x.data() + (i0 - m_lo);
    for (long m = m_lo; m <= m_hi; ++m, --xi)
      acc += static_cast<double>(*xi) * hsub[m];
    y[jj] = static_cast<float>(acc);
  }
  return y;
}

void peak_normalize(std::vector<float>& x) {
  float peak = 0.0f;
  for (float v : x) peak = std::max(peak, std::fabs(v));
  if (peak > 0.0f)
    for (float& v : x) v /= peak;
}

int load_one(const char* path, int target_sr, int normalize,
             std::vector<float>& out) {
  std::vector<uint8_t> buf;
  if (!read_file(path, buf)) return -1;
  Wav w;
  if (!parse_wav(buf, w)) return -2;
  if (w.sample_rate != target_sr)
    w.samples = resample_poly(w.samples, target_sr, w.sample_rate);
  if (normalize) peak_normalize(w.samples);
  out = std::move(w.samples);
  return 0;
}

}  // namespace

extern "C" {

// Load one wav -> mono float32 at target_sr. Returns sample count (>= 0) or
// a negative error (-1 io, -2 parse/format). *out is malloc'd; free with
// dacs_free.
long dacs_load_wav(const char* path, int target_sr, int normalize,
                   float** out) {
  std::vector<float> s;
  int rc = load_one(path, target_sr, normalize, s);
  if (rc < 0) return rc;
  *out = static_cast<float*>(std::malloc(s.size() * sizeof(float)));
  if (!*out) return -3;
  std::memcpy(*out, s.data(), s.size() * sizeof(float));
  return static_cast<long>(s.size());
}

void dacs_free(float* p) { std::free(p); }

// Load n files with a thread fan-out. outs[i]/lens[i] receive each file's
// buffer and length; lens[i] < 0 marks that file's error code. Returns the
// number of successfully loaded files.
long dacs_load_many(const char** paths, long n, int target_sr, int normalize,
                    int n_threads, float** outs, long* lens) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> pool;
  std::vector<long> next_idx(1, 0);
  auto worker = [&](int tid) {
    for (long i = tid; i < n; i += n_threads) {
      std::vector<float> s;
      int rc = load_one(paths[i], target_sr, normalize, s);
      if (rc < 0) {
        outs[i] = nullptr;
        lens[i] = rc;
        continue;
      }
      outs[i] = static_cast<float*>(std::malloc(s.size() * sizeof(float)));
      if (!outs[i]) {
        lens[i] = -3;
        continue;
      }
      std::memcpy(outs[i], s.data(), s.size() * sizeof(float));
      lens[i] = static_cast<long>(s.size());
    }
  };
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker, t);
  for (auto& th : pool) th.join();
  long ok = 0;
  for (long i = 0; i < n; ++i)
    if (lens[i] >= 0) ++ok;
  return ok;
}

}  // extern "C"
