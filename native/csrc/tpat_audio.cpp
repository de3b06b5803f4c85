// Native host audio frontend: WAV decode + Kaldi-compatible log-mel fbank.
//
// Replaces the torchaudio C++ kernels the reference depends on
// (SURVEY.md §2.5: torchaudio.compliance.kaldi.fbank + sox/ffmpeg decode).
// Exposed via a minimal C ABI consumed by ctypes
// (tpat_tpu/data/native.py); semantics must match the Python reference
// implementation in tpat_tpu/ops/fbank.py exactly:
//
//   frame (snip_edges, 25 ms / 10 ms) -> per-frame DC removal ->
//   pre-emphasis 0.97 (left replicate) -> window (hanning or povey) ->
//   zero-pad to next pow2 -> rFFT power spectrum ->
//   Kaldi mel bank (1127 ln(1+f/700), low=20, high=nyquist, nyquist
//   column zero) -> log(max(x, FLT_EPSILON)).

#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <memory>
#include <mutex>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

// ---------------------------------------------------------------------------
// WAV decode (PCM 8/16/24/32 and IEEE float32), RIFF chunk walk.
// ---------------------------------------------------------------------------

struct WavInfo {
  int32_t sample_rate = 0;
  int32_t channels = 0;
  int32_t bits = 0;
  int32_t format = 0;  // 1 = PCM, 3 = IEEE float
};

// unsigned return + unsigned shift: `int(p[3]) << 24` with a top byte
// >= 0x80 would shift into the sign bit — signed-overflow UB pre-C++20
// (hit by every negative 32-bit PCM sample and any chunk len >= 2^31)
uint32_t read_u32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) |
         (static_cast<uint32_t>(p[3]) << 24);
}
int read_u16(const uint8_t* p) { return p[0] | (p[1] << 8); }

}  // namespace

extern "C" {

// Decode a WAV file into `out` (deinterleaved: channel c occupies
// out[c*n .. c*n+n)).  On entry *n_inout = capacity (floats); on success
// *n_inout = samples per channel.  Returns 0 on success.
int tpat_load_wav(const char* path, float* out, int64_t* n_inout,
                  int32_t* sample_rate, int32_t* channels, int64_t capacity) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (size < 44) {
    fclose(f);
    return 2;
  }
  std::vector<uint8_t> buf(size);
  if (fread(buf.data(), 1, size, f) != static_cast<size_t>(size)) {
    fclose(f);
    return 3;
  }
  fclose(f);

  if (memcmp(buf.data(), "RIFF", 4) != 0 || memcmp(buf.data() + 8, "WAVE", 4) != 0)
    return 4;

  WavInfo info;
  const uint8_t* data = nullptr;
  int64_t data_len = 0;
  size_t pos = 12;
  while (pos + 8 <= static_cast<size_t>(size)) {
    const uint8_t* hdr = buf.data() + pos;
    uint32_t chunk_len = read_u32(hdr + 4);
    const uint8_t* body = hdr + 8;
    // bytes of this chunk's body actually present in the buffer — a
    // truncated file can declare more than remains; never read past it
    size_t body_avail = static_cast<size_t>(size) - pos - 8;
    if (memcmp(hdr, "fmt ", 4) == 0 && chunk_len >= 16 && body_avail >= 16) {
      info.format = read_u16(body);
      info.channels = read_u16(body + 2);
      info.sample_rate = read_u32(body + 4);
      info.bits = read_u16(body + 14);
    } else if (memcmp(hdr, "data", 4) == 0) {
      data = body;
      data_len = chunk_len;
      if (pos + 8 + data_len > static_cast<size_t>(size))
        data_len = size - pos - 8;
    }
    pos += 8 + chunk_len + (chunk_len & 1);
  }
  if (!data || info.channels <= 0 || info.sample_rate <= 0) return 5;
  if (info.format != 1 && info.format != 3) return 6;
  // a malformed fmt chunk can declare bits 0 (or other widths the decode
  // loop doesn't handle) — reject before the division below
  if (info.bits != 8 && info.bits != 16 && info.bits != 24 &&
      info.bits != 32)
    return 6;
  // IEEE float (format 3) is only defined here for 32-bit samples: a
  // float WAV with bits 8/16/24 would otherwise fall into the integer
  // PCM branches below and silently decode garbage instead of erroring
  // (the error makes data/wav.py raise rather than train on noise)
  if (info.format == 3 && info.bits != 32) return 6;

  int bytes = info.bits / 8;
  int64_t total = data_len / bytes;
  int64_t n = total / info.channels;
  if (n * info.channels > capacity) return 7;

  for (int64_t i = 0; i < n; ++i) {
    for (int c = 0; c < info.channels; ++c) {
      const uint8_t* s = data + (i * info.channels + c) * bytes;
      float val;
      if (info.format == 3 && info.bits == 32) {
        float tmp;
        memcpy(&tmp, s, 4);
        val = tmp;
      } else if (info.bits == 16) {
        int16_t v = static_cast<int16_t>(read_u16(s));
        val = v / 32768.0f;
      } else if (info.bits == 32) {
        int32_t v = static_cast<int32_t>(read_u32(s));
        val = static_cast<float>(v) / 2147483648.0f;
      } else if (info.bits == 24) {
        int32_t v = s[0] | (s[1] << 8) | (s[2] << 16);
        if (v >= (1 << 23)) v -= (1 << 24);
        val = static_cast<float>(v) / static_cast<float>(1 << 23);
      } else if (info.bits == 8) {
        val = (static_cast<int>(s[0]) - 128) / 128.0f;
      } else {
        return 6;
      }
      out[c * n + i] = val;
    }
  }
  *n_inout = n;
  *sample_rate = info.sample_rate;
  *channels = info.channels;
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// FFT: iterative radix-2, double precision (sizes are powers of two).
// ---------------------------------------------------------------------------

namespace {

void fft_inplace(std::vector<double>& re, std::vector<double>& im) {
  const size_t n = re.size();
  // bit reversal
  for (size_t i = 1, j = 0; i < n; ++i) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      std::swap(re[i], re[j]);
      std::swap(im[i], im[j]);
    }
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    double ang = -2.0 * kPi / static_cast<double>(len);
    double wr = cos(ang), wi = sin(ang);
    for (size_t i = 0; i < n; i += len) {
      double cr = 1.0, ci = 0.0;
      for (size_t j = 0; j < len / 2; ++j) {
        size_t a = i + j, b = i + j + len / 2;
        double xr = re[b] * cr - im[b] * ci;
        double xi = re[b] * ci + im[b] * cr;
        re[b] = re[a] - xr;
        im[b] = im[a] - xi;
        re[a] += xr;
        im[a] += xi;
        double ncr = cr * wr - ci * wi;
        ci = cr * wi + ci * wr;
        cr = ncr;
      }
    }
  }
}

double mel_scale(double f) { return 1127.0 * log(1.0 + f / 700.0); }

struct MelBank {
  int sr = 0;
  int bins = 0;
  int nfft = 0;
  std::vector<float> weights;  // (bins, nfft/2 + 1)
  std::vector<int> band_lo, band_hi;  // nonzero support per filter
};

// Cached bank behind a mutex, handed out as an immutable shared_ptr:
// ctypes drops the GIL, so the threaded data loader can run tpat_fbank
// concurrently — a bare mutable global raced (use-after-free when one
// thread rebuilt while another read).  Readers hold their own reference;
// the cache swap is brief and lock-guarded.
std::mutex g_bank_mu;
std::shared_ptr<const MelBank> g_bank_cache;

std::shared_ptr<const MelBank> get_mel_bank(int sr, int bins, int nfft) {
  std::lock_guard<std::mutex> lk(g_bank_mu);
  if (g_bank_cache && g_bank_cache->sr == sr && g_bank_cache->bins == bins &&
      g_bank_cache->nfft == nfft)
    return g_bank_cache;
  auto bank = std::make_shared<MelBank>();
  MelBank& g_bank = *bank;
  int num_fft_bins = nfft / 2;
  double nyquist = 0.5 * sr;
  double low = 20.0, high = nyquist;
  double mel_low = mel_scale(low), mel_high = mel_scale(high);
  double delta = (mel_high - mel_low) / (bins + 1);
  double bin_width = static_cast<double>(sr) / nfft;

  g_bank.weights.assign(static_cast<size_t>(bins) * (num_fft_bins + 1), 0.0f);
  g_bank.band_lo.assign(bins, num_fft_bins);
  g_bank.band_hi.assign(bins, 0);
  for (int b = 0; b < bins; ++b) {
    double left = mel_low + b * delta;
    double center = mel_low + (b + 1) * delta;
    double right = mel_low + (b + 2) * delta;
    for (int k = 0; k < num_fft_bins; ++k) {
      double mel = mel_scale(bin_width * k);
      double up = (mel - left) / (center - left);
      double down = (right - mel) / (right - center);
      double w = up < down ? up : down;
      if (w > 0) {
        g_bank.weights[b * (num_fft_bins + 1) + k] = static_cast<float>(w);
        if (k < g_bank.band_lo[b]) g_bank.band_lo[b] = k;
        if (k + 1 > g_bank.band_hi[b]) g_bank.band_hi[b] = k + 1;
      }
    }
    if (g_bank.band_lo[b] > g_bank.band_hi[b]) g_bank.band_lo[b] = g_bank.band_hi[b];
  }
  g_bank.sr = sr;
  g_bank.bins = bins;
  g_bank.nfft = nfft;
  g_bank_cache = bank;
  return bank;
}

}  // namespace

extern "C" {

// C ABI version.  Bump on ANY signature change (the python side refuses
// to load a mismatched .so rather than corrupting argument registers).
// v2: tpat_fbank gained the mid-signature window_type argument.
int tpat_abi_version() { return 2; }

// Kaldi-compatible fbank: waveform (n samples, mono float32) ->
// out (num_frames x num_mel_bins, row-major).  window_type: 0 = hanning
// (the reference recipes' choice), 1 = povey (Kaldi's default,
// hanning^0.85).  Returns 0 on success, -1 on unknown window.
int tpat_fbank(const float* waveform, int64_t n, int32_t sample_rate,
               int32_t num_mel_bins, int32_t window_type, float* out,
               int64_t* out_frames) {
  const int shift = sample_rate / 100;           // 10 ms
  const int win = sample_rate * 25 / 1000;       // 25 ms
  int nfft = 1;
  while (nfft < win) nfft <<= 1;
  if (n < win) {
    *out_frames = 0;
    return 0;
  }
  const int64_t frames = 1 + (n - win) / shift;
  std::shared_ptr<const MelBank> bank =
      get_mel_bank(sample_rate, num_mel_bins, nfft);
  const int num_bins_fft = nfft / 2 + 1;

  if (window_type != 0 && window_type != 1) return -1;
  std::vector<double> window(win);
  for (int i = 0; i < win; ++i) {
    const double hann = 0.5 - 0.5 * cos(2.0 * kPi * i / (win - 1));
    window[i] = window_type == 1 ? pow(hann, 0.85) : hann;
  }

  std::vector<double> re(nfft), im(nfft);
  std::vector<double> power(num_bins_fft);

  for (int64_t fidx = 0; fidx < frames; ++fidx) {
    const float* frame = waveform + fidx * shift;
    double mean = 0.0;
    for (int i = 0; i < win; ++i) mean += frame[i];
    mean /= win;

    // DC removal + pre-emphasis (left-replicated) + window, zero pad
    double prev = frame[0] - mean;
    re[0] = (prev - 0.97 * prev) * window[0];
    for (int i = 1; i < win; ++i) {
      double cur = frame[i] - mean;
      re[i] = (cur - 0.97 * prev) * window[i];
      prev = cur;
    }
    for (int i = win; i < nfft; ++i) re[i] = 0.0;
    std::fill(im.begin(), im.end(), 0.0);

    fft_inplace(re, im);
    for (int k = 0; k < num_bins_fft; ++k)
      power[k] = re[k] * re[k] + im[k] * im[k];

    float* row = out + fidx * num_mel_bins;
    for (int b = 0; b < num_mel_bins; ++b) {
      const float* w = bank->weights.data() + b * num_bins_fft;
      double acc = 0.0;
      for (int k = bank->band_lo[b]; k < bank->band_hi[b]; ++k)
        acc += w[k] * power[k];
      if (acc < FLT_EPSILON) acc = FLT_EPSILON;
      row[b] = static_cast<float>(log(acc));
    }
  }
  *out_frames = frames;
  return 0;
}

}  // extern "C"
