// FLAC decoder — native audio-IO component.
//
// Replaces the reference's libsndfile/soundfile dependency (ref:
// one_peace/data/base_dataset.py:54 `sf.read`) with a self-contained
// decoder: STREAMINFO parsing, fixed + LPC prediction, Rice residuals,
// all stereo decorrelation modes, 8/16/24/32-bit samples.  Exposed as a
// C ABI consumed via ctypes (one_peace_tpu/data/flac.py).
//
// Build: g++ -O3 -shared -fPIC flac_decoder.cpp -o libflacdec.so

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct BitReader {
    const uint8_t* data;
    size_t size;
    size_t byte_pos = 0;
    int bit_pos = 0;  // bits consumed in current byte (MSB first)
    bool error = false;

    BitReader(const uint8_t* d, size_t n) : data(d), size(n) {}

    inline uint32_t read_bit() {
        if (byte_pos >= size) { error = true; return 0; }
        uint32_t bit = (data[byte_pos] >> (7 - bit_pos)) & 1u;
        if (++bit_pos == 8) { bit_pos = 0; ++byte_pos; }
        return bit;
    }

    uint64_t read_bits(int n) {
        uint64_t v = 0;
        while (n > 0) {
            if (byte_pos >= size) { error = true; return 0; }
            int avail = 8 - bit_pos;
            int take = n < avail ? n : avail;
            uint32_t chunk = (data[byte_pos] >> (avail - take)) & ((1u << take) - 1u);
            v = (v << take) | chunk;
            bit_pos += take;
            n -= take;
            if (bit_pos == 8) { bit_pos = 0; ++byte_pos; }
        }
        return v;
    }

    int64_t read_signed(int n) {
        uint64_t v = read_bits(n);
        if (n > 0 && (v >> (n - 1)) & 1u) v |= ~((1ull << n) - 1ull);
        return (int64_t)v;
    }

    uint32_t read_unary() {
        uint32_t q = 0;
        while (!error && read_bit() == 0) ++q;
        return q;
    }

    void align() {
        if (bit_pos != 0) { bit_pos = 0; ++byte_pos; }
    }
};

// UTF-8-style coded number used for frame/sample index
uint64_t read_utf8(BitReader& br) {
    uint32_t b0 = (uint32_t)br.read_bits(8);
    int extra = 0;
    uint64_t v = 0;
    if (b0 < 0x80) return b0;
    else if ((b0 & 0xE0) == 0xC0) { v = b0 & 0x1F; extra = 1; }
    else if ((b0 & 0xF0) == 0xE0) { v = b0 & 0x0F; extra = 2; }
    else if ((b0 & 0xF8) == 0xF0) { v = b0 & 0x07; extra = 3; }
    else if ((b0 & 0xFC) == 0xF8) { v = b0 & 0x03; extra = 4; }
    else if ((b0 & 0xFE) == 0xFC) { v = b0 & 0x01; extra = 5; }
    else if (b0 == 0xFE) { v = 0; extra = 6; }
    else { br.error = true; return 0; }
    for (int i = 0; i < extra; ++i) v = (v << 6) | (br.read_bits(8) & 0x3F);
    return v;
}

void decode_residuals(BitReader& br, int order, int block_size,
                      std::vector<int64_t>& out) {
    int method = (int)br.read_bits(2);  // 0 = rice 4-bit, 1 = rice 5-bit
    if (method > 1) { br.error = true; return; }
    int param_bits = method == 0 ? 4 : 5;
    int escape = method == 0 ? 15 : 31;
    int partition_order = (int)br.read_bits(4);
    int partitions = 1 << partition_order;
    int idx = order;
    for (int p = 0; p < partitions; ++p) {
        int count = (block_size >> partition_order) - (p == 0 ? order : 0);
        // a malformed partition_order can make the p==0 partition smaller
        // than the warmup while later partitions still carry full counts —
        // the write index must never pass the block (heap overflow
        // otherwise)
        if (count > 0 && idx + count > block_size) { br.error = true; return; }
        int param = (int)br.read_bits(param_bits);
        if (param == escape) {
            int raw_bits = (int)br.read_bits(5);
            for (int i = 0; i < count; ++i)
                out[idx++] = raw_bits ? br.read_signed(raw_bits) : 0;
        } else {
            for (int i = 0; i < count; ++i) {
                uint32_t q = br.read_unary();
                uint64_t r = param ? br.read_bits(param) : 0;
                uint64_t u = ((uint64_t)q << param) | r;
                out[idx++] = (int64_t)(u >> 1) ^ -(int64_t)(u & 1);
            }
        }
        if (br.error) return;
    }
}

// wrapping 64-bit ops: corrupt streams feed arbitrary values into the
// predictors; signed overflow is UB, unsigned wraparound is defined (the
// decoded samples are garbage either way and rejected downstream)
static inline int64_t wadd(int64_t a, int64_t b) {
    return (int64_t)((uint64_t)a + (uint64_t)b);
}
static inline int64_t wmul(int64_t a, int64_t b) {
    return (int64_t)((uint64_t)a * (uint64_t)b);
}

bool decode_subframe(BitReader& br, int block_size, int bps,
                     std::vector<int64_t>& out) {
    br.read_bit();  // zero pad bit
    int type = (int)br.read_bits(6);
    int wasted = 0;
    if (br.read_bit()) wasted = 1 + (int)br.read_unary();
    if (wasted >= 64 || wasted > bps) { br.error = true; return false; }
    bps -= wasted;
    out.assign(block_size, 0);

    if (type == 0) {  // CONSTANT
        int64_t v = br.read_signed(bps);
        for (int i = 0; i < block_size; ++i) out[i] = v;
    } else if (type == 1) {  // VERBATIM
        for (int i = 0; i < block_size; ++i) out[i] = br.read_signed(bps);
    } else if (type >= 8 && type <= 12) {  // FIXED, order 0..4
        int order = type - 8;
        if (order > block_size) { br.error = true; return false; }
        for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
        decode_residuals(br, order, block_size, out);
        switch (order) {
            case 0: break;
            case 1:
                for (int i = 1; i < block_size; ++i)
                    out[i] = wadd(out[i], out[i - 1]);
                break;
            case 2:
                for (int i = 2; i < block_size; ++i)
                    out[i] = wadd(out[i], wadd(wmul(2, out[i - 1]),
                                               wmul(-1, out[i - 2])));
                break;
            case 3:
                for (int i = 3; i < block_size; ++i)
                    out[i] = wadd(out[i], wadd(wmul(3, out[i - 1]),
                             wadd(wmul(-3, out[i - 2]), out[i - 3])));
                break;
            case 4:
                for (int i = 4; i < block_size; ++i)
                    out[i] = wadd(out[i], wadd(wmul(4, out[i - 1]),
                             wadd(wmul(-6, out[i - 2]),
                             wadd(wmul(4, out[i - 3]),
                                  wmul(-1, out[i - 4])))));
                break;
        }
    } else if (type >= 32) {  // LPC, order 1..32
        int order = type - 31;
        if (order > block_size) { br.error = true; return false; }
        for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
        int precision = (int)br.read_bits(4) + 1;
        int shift = (int)br.read_signed(5);
        if (shift < 0) { br.error = true; return false; }  // spec: >= 0
        std::vector<int64_t> coefs(order);
        for (int i = 0; i < order; ++i) coefs[i] = br.read_signed(precision);
        decode_residuals(br, order, block_size, out);
        for (int i = order; i < block_size; ++i) {
            int64_t pred = 0;
            for (int j = 0; j < order; ++j)
                pred = wadd(pred, wmul(coefs[j], out[i - 1 - j]));
            out[i] = wadd(out[i], pred >> shift);
        }
    } else {
        br.error = true;
    }
    if (wasted)
        for (int i = 0; i < block_size; ++i)
            out[i] = (int64_t)((uint64_t)out[i] << wasted);
    return !br.error;
}

const int BLOCK_SIZES[16] = {0, 192, 576, 1152, 2304, 4608, -1, -2, 256, 512,
                             1024, 2048, 4096, 8192, 16384, 32768};
const int SAMPLE_RATES[16] = {0, 88200, 176400, 192000, 8000, 16000, 22050,
                              24000, 32000, 44100, 48000, 96000, -1, -2, -3, 0};

}  // namespace

extern "C" {

// Decode a FLAC byte stream to interleaved-averaged mono float32.
// Returns 0 on success; out buffer allocated with malloc (free with
// flacdec_free).
int flacdec_decode(const uint8_t* data, size_t size, float** out_samples,
                   int64_t* out_len, int32_t* out_sample_rate) {
    if (size < 4 || memcmp(data, "fLaC", 4) != 0) return -1;
    size_t pos = 4;
    int sample_rate = 0, channels = 0, bps = 0;
    uint64_t total_samples = 0;
    // metadata blocks
    bool last = false;
    while (!last) {
        if (pos + 4 > size) return -2;
        last = (data[pos] & 0x80) != 0;
        int type = data[pos] & 0x7F;
        uint32_t len = (data[pos + 1] << 16) | (data[pos + 2] << 8) | data[pos + 3];
        pos += 4;
        if (pos + len > size) return -2;
        if (type == 0 && len >= 34) {  // STREAMINFO
            const uint8_t* p = data + pos;
            sample_rate = (p[10] << 12) | (p[11] << 4) | (p[12] >> 4);
            channels = ((p[12] >> 1) & 0x7) + 1;
            bps = (((p[12] & 1) << 4) | (p[13] >> 4)) + 1;
            total_samples = ((uint64_t)(p[13] & 0x0F) << 32) | ((uint64_t)p[14] << 24)
                          | (p[15] << 16) | (p[16] << 8) | p[17];
        }
        pos += len;
    }
    if (sample_rate == 0 || channels == 0 || bps == 0) return -3;

    // hard output cap: a malicious stream can encode huge blocks in a few
    // bytes (CONSTANT subframes); never allocate unbounded memory from
    // attacker-controlled counts (1h of 16 kHz audio ~ 230 MB floats)
    const uint64_t kMaxSamples = 1ull << 26;  // ~67M samples
    std::vector<float> mono;
    if (total_samples)
        mono.reserve((size_t)(total_samples < kMaxSamples ? total_samples
                                                          : kMaxSamples));

    BitReader br(data, size);
    br.byte_pos = pos;

    std::vector<std::vector<int64_t>> ch(channels);
    while (br.byte_pos < size && !br.error) {
        // frame header: sync 0b11111111111110
        uint32_t sync = (uint32_t)br.read_bits(14);
        if (br.error) break;
        if (sync != 0x3FFE) return -4;
        br.read_bits(1);  // reserved
        int blocking = (int)br.read_bits(1);
        (void)blocking;
        int bs_code = (int)br.read_bits(4);
        int sr_code = (int)br.read_bits(4);
        int ch_code = (int)br.read_bits(4);
        int bps_code = (int)br.read_bits(3);
        br.read_bits(1);  // reserved
        read_utf8(br);    // frame/sample number

        int block_size;
        if (bs_code == 6) block_size = (int)br.read_bits(8) + 1;
        else if (bs_code == 7) block_size = (int)br.read_bits(16) + 1;
        else block_size = BLOCK_SIZES[bs_code];
        if (block_size <= 0) return -5;

        if (sr_code == 12) br.read_bits(8);
        else if (sr_code == 13 || sr_code == 14) br.read_bits(16);

        int frame_bps = bps;
        switch (bps_code) {
            case 1: frame_bps = 8; break;
            case 2: frame_bps = 12; break;
            case 4: frame_bps = 16; break;
            case 5: frame_bps = 20; break;
            case 6: frame_bps = 24; break;
            case 7: frame_bps = 32; break;
            default: break;
        }
        br.read_bits(8);  // header CRC

        int nch = channels;
        int mode = 0;  // 0 independent, 1 left-side, 2 right-side, 3 mid-side
        if (ch_code <= 7) nch = ch_code + 1;
        else if (ch_code == 8) { nch = 2; mode = 1; }
        else if (ch_code == 9) { nch = 2; mode = 2; }
        else if (ch_code == 10) { nch = 2; mode = 3; }
        else return -6;
        // the frame header must not claim more channels than STREAMINFO
        // allocated (ch[] is sized from STREAMINFO; trusting the frame
        // header here would index past it)
        if (nch > channels) return -6;

        for (int c = 0; c < nch; ++c) {
            int sub_bps = frame_bps;
            if ((mode == 1 && c == 1) || (mode == 2 && c == 0) ||
                (mode == 3 && c == 1))
                sub_bps += 1;  // the difference channel carries one extra bit
            if (!decode_subframe(br, block_size, sub_bps, ch[c])) return -7;
        }
        br.align();
        br.read_bits(16);  // frame CRC

        // stereo decorrelation
        if (mode == 1) {  // left-side: ch0 = L, ch1 = L - R
            for (int i = 0; i < block_size; ++i)
                ch[1][i] = wadd(ch[0][i], wmul(-1, ch[1][i]));
        } else if (mode == 2) {  // right-side: ch0 = L - R, ch1 = R
            for (int i = 0; i < block_size; ++i)
                ch[0][i] = wadd(ch[0][i], ch[1][i]);
        } else if (mode == 3) {  // mid-side
            for (int i = 0; i < block_size; ++i) {
                int64_t side = ch[1][i];
                int64_t mid = (int64_t)(((uint64_t)ch[0][i] << 1)
                                        | ((uint64_t)side & 1));
                ch[0][i] = wadd(mid, side) >> 1;
                ch[1][i] = wadd(mid, wmul(-1, side)) >> 1;
            }
        }

        float scale = 1.0f / (float)(1ll << (frame_bps - 1));
        for (int i = 0; i < block_size; ++i) {
            float acc = 0.f;
            for (int c = 0; c < nch; ++c) acc += (float)ch[c][i];
            mono.push_back(acc / nch * scale);
        }
        if (total_samples && mono.size() >= total_samples) break;
        if (mono.size() >= kMaxSamples) return -9;
    }

    if (total_samples && mono.size() > total_samples) mono.resize(total_samples);
    float* buf = (float*)malloc(mono.size() * sizeof(float));
    if (!buf) return -8;
    memcpy(buf, mono.data(), mono.size() * sizeof(float));
    *out_samples = buf;
    *out_len = (int64_t)mono.size();
    *out_sample_rate = sample_rate;
    return 0;
}

void flacdec_free(float* p) { free(p); }

}  // extern "C"
