// Native corpus data loader for libllsm2_tpu.
//
// The reference reads audio one file at a time through ciglet's wavread
// (ciglet.h); the rebuild's batched corpus path instead needs whole padded
// batches assembled per bucket (SURVEY.md section 2, BASELINE config 5).
// This module does the host-side heavy lifting in C++: parse RIFF/WAVE
// (PCM16 / PCM32 / float32, mono or averaged multichannel), convert to
// float32, and write each utterance into its row of a caller-provided
// padded [batch, bucket_samples] buffer -- one C call per batch instead of
// per-file Python I/O + numpy packing.
//
// C ABI + ctypes (no pybind11 in the image); see runtime/native.py.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct WavData {
    std::vector<float> samples;   // mono
    int32_t sample_rate = 0;
};

bool parse_wav(FILE* f, WavData* out) {
    auto rd_u32 = [&](uint32_t* v) {
        return std::fread(v, 4, 1, f) == 1;
    };
    auto rd_u16 = [&](uint16_t* v) {
        return std::fread(v, 2, 1, f) == 1;
    };
    // total file size: header fields are UNTRUSTED (a malformed
    // chunk_size of ~4 GB must not drive the allocation below)
    if (std::fseek(f, 0, SEEK_END) != 0) return false;
    long fsize = std::ftell(f);
    if (fsize < 0 || std::fseek(f, 0, SEEK_SET) != 0) return false;
    uint32_t riff, size, wave;
    if (!rd_u32(&riff) || !rd_u32(&size) || !rd_u32(&wave) ||
        riff != 0x46464952u /*RIFF*/ || wave != 0x45564157u /*WAVE*/) {
        return false;
    }
    uint16_t fmt = 0, channels = 0, bits = 0;
    uint32_t rate = 0;
    bool got_fmt = false, ok = false;
    while (true) {
        uint32_t tag, chunk_size;
        if (!rd_u32(&tag) || !rd_u32(&chunk_size)) break;
        if (tag == 0x20746d66u /*"fmt "*/) {
            uint32_t brate, balign_bits;
            if (!rd_u16(&fmt) || !rd_u16(&channels) || !rd_u32(&rate) ||
                !rd_u32(&brate) || !rd_u32(&balign_bits)) break;
            bits = static_cast<uint16_t>(balign_bits >> 16);
            if (chunk_size > 16 &&
                std::fseek(f, chunk_size - 16, SEEK_CUR) != 0) break;
            got_fmt = true;
        } else if (tag == 0x61746164u /*"data"*/ && got_fmt) {
            if (channels == 0) break;
            // reject formats the sample loop cannot decode (it used to
            // emit silent zeros for them); a failed row reports length
            // 0 to the caller instead
            if (!((fmt == 1 && (bits == 16 || bits == 32)) ||
                  (fmt == 3 && bits == 32))) break;
            // clamp the declared size to the bytes actually present so
            // the allocation is bounded by the file on disk
            long pos = std::ftell(f);
            if (pos < 0) break;
            uint64_t avail = static_cast<uint64_t>(fsize - pos);
            if (chunk_size > avail)
                chunk_size = static_cast<uint32_t>(avail);
            std::vector<uint8_t> raw(chunk_size);
            if (std::fread(raw.data(), 1, chunk_size, f) != chunk_size)
                break;
            size_t bytes_per = bits / 8;
            size_t nframes = chunk_size / (bytes_per * channels);
            out->samples.resize(nframes);
            out->sample_rate = static_cast<int32_t>(rate);
            for (size_t i = 0; i < nframes; ++i) {
                double acc = 0.0;
                for (size_t c = 0; c < channels; ++c) {
                    const uint8_t* p = raw.data() +
                        (i * channels + c) * bytes_per;
                    double v = 0.0;
                    if (fmt == 1 && bits == 16) {
                        int16_t s;
                        std::memcpy(&s, p, 2);
                        v = s / 32768.0;
                    } else if (fmt == 1 && bits == 32) {
                        int32_t s;
                        std::memcpy(&s, p, 4);
                        v = s / 2147483648.0;
                    } else if (fmt == 3 && bits == 32) {
                        float s;
                        std::memcpy(&s, p, 4);
                        v = s;
                    }
                    acc += v;
                }
                out->samples[i] = static_cast<float>(acc / channels);
            }
            ok = true;
            break;
        } else {
            if (std::fseek(f, (chunk_size + 1) & ~1u, SEEK_CUR) != 0) break;
        }
    }
    return ok;
}

bool read_wav(const char* path, WavData* out) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    bool ok = false;
    // exception barrier: this is a C-ABI boundary called from ctypes --
    // a bad_alloc (corrupt size field) escaping here would terminate
    // the whole serving/corpus process
    try {
        ok = parse_wav(f, out);
    } catch (...) {
        ok = false;
    }
    std::fclose(f);
    return ok;
}

}  // namespace

extern "C" {

// Load one WAV into `out` (capacity `max_samples`); returns the number of
// samples written (truncated to capacity), 0 on parse failure.  The file's
// sample rate is stored in *sample_rate.
int64_t llsm_load_wav(const char* path, float* out, int64_t max_samples,
                      int32_t* sample_rate) {
    WavData w;
    if (!read_wav(path, &w)) return 0;
    int64_t n = static_cast<int64_t>(w.samples.size());
    if (n > max_samples) n = max_samples;
    std::memcpy(out, w.samples.data(), n * sizeof(float));
    if (sample_rate) *sample_rate = w.sample_rate;
    return n;
}

// Assemble a zero-padded batch: `paths` is `batch` NUL-terminated strings
// concatenated (offsets in `path_offsets`); each file fills row i of
// out[batch, bucket_samples].  lengths[i] receives the true sample count
// (0 on failure).  Returns the number of successfully loaded rows.
int64_t llsm_load_batch(const char* paths, const int64_t* path_offsets,
                        int64_t batch, float* out, int64_t bucket_samples,
                        int64_t* lengths, int32_t* sample_rates) {
    int64_t ok = 0;
    for (int64_t i = 0; i < batch; ++i) {
        float* row = out + i * bucket_samples;
        std::memset(row, 0, bucket_samples * sizeof(float));
        int32_t sr = 0;
        int64_t n = llsm_load_wav(paths + path_offsets[i], row,
                                  bucket_samples, &sr);
        lengths[i] = n;
        if (sample_rates) sample_rates[i] = sr;
        if (n > 0) ++ok;
    }
    return ok;
}

// Same batch assembly but emitting int16 PCM rows (values scaled by
// 32767): the accelerator converts to float on-chip, halving the
// host->device transfer bytes of the corpus hot path.
int64_t llsm_load_batch_i16(const char* paths, const int64_t* path_offsets,
                            int64_t batch, int16_t* out,
                            int64_t bucket_samples, int64_t* lengths,
                            int32_t* sample_rates) {
    int64_t ok = 0;
    std::vector<float> tmp(bucket_samples);
    for (int64_t i = 0; i < batch; ++i) {
        int16_t* row = out + i * bucket_samples;
        std::memset(row, 0, bucket_samples * sizeof(int16_t));
        int32_t sr = 0;
        int64_t n = llsm_load_wav(paths + path_offsets[i], tmp.data(),
                                  bucket_samples, &sr);
        for (int64_t j = 0; j < n; ++j) {
            float v = tmp[j] * 32767.0f;
            if (v > 32767.0f) v = 32767.0f;
            if (v < -32768.0f) v = -32768.0f;
            row[j] = static_cast<int16_t>(v);
        }
        lengths[i] = n;
        if (sample_rates) sample_rates[i] = sr;
        if (n > 0) ++ok;
    }
    return ok;
}

}  // extern "C"
