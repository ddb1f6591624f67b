// Native streaming runtime core for libllsm2_tpu (reference: llsmrt.c --
// the sample/frame ring buffers behind llsm_rtsynth_buffer_feed/_fetch).
//
// The TPU compute path renders per-frame segments (JAX/XLA); this module
// is the host-side real-time machinery around it: a single-producer
// single-consumer float ring buffer with overlap-add writes, so feed()
// can OLA a rendered segment and fetch() can drain finished samples with
// one-frame latency and no Python-level sample loops.
//
// Built as a plain C-ABI shared library (no pybind11 in the image);
// loaded from Python via ctypes (libllsm2_tpu/runtime/native.py).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <new>

extern "C" {

struct LlsmRing {
    float*  data;
    int64_t capacity;   // samples
    int64_t head;       // absolute index of first unread sample
    int64_t tail;       // absolute index one past the last *finalized* sample
    int64_t wmax;       // absolute index one past the last written (OLA'd) sample
};

LlsmRing* llsm_ring_create(int64_t capacity) {
    if (capacity <= 0) return nullptr;
    auto* r = new (std::nothrow) LlsmRing();
    if (!r) return nullptr;
    r->data = static_cast<float*>(std::calloc(capacity, sizeof(float)));
    if (!r->data) { delete r; return nullptr; }
    r->capacity = capacity;
    r->head = r->tail = r->wmax = 0;
    return r;
}

void llsm_ring_destroy(LlsmRing* r) {
    if (!r) return;
    std::free(r->data);
    delete r;
}

// Overlap-add `n` samples starting at absolute position `pos`; samples
// become readable only when finalized via llsm_ring_advance.  Returns 0 on
// success, -1 if the write would overrun the ring capacity.
int llsm_ring_add(LlsmRing* r, const float* seg, int64_t n, int64_t pos) {
    if (!r || pos < r->head) return -1;
    if (pos + n - r->head > r->capacity) return -1;
    for (int64_t i = 0; i < n; ++i) {
        int64_t a = pos + i;
        int64_t idx = a % r->capacity;
        if (a >= r->wmax) r->data[idx] = seg[i];
        else              r->data[idx] += seg[i];
    }
    if (pos + n > r->wmax) r->wmax = pos + n;
    return 0;
}

// Mark samples up to absolute position `upto` as finalized (no further
// OLA contributions will arrive before them).
void llsm_ring_advance(LlsmRing* r, int64_t upto) {
    if (!r) return;
    if (upto > r->wmax) upto = r->wmax;
    if (upto > r->tail) r->tail = upto;
}

int64_t llsm_ring_readable(const LlsmRing* r) {
    return r ? (r->tail - r->head) : 0;
}

// Pop up to `n` finalized samples into `out`; returns the number popped.
int64_t llsm_ring_read(LlsmRing* r, float* out, int64_t n) {
    if (!r) return 0;
    int64_t avail = r->tail - r->head;
    if (n > avail) n = avail;
    for (int64_t i = 0; i < n; ++i) {
        int64_t idx = (r->head + i) % r->capacity;
        out[i] = r->data[idx];
        r->data[idx] = 0.0f;   // zero-on-read so the slot is OLA-fresh
    }
    r->head += n;
    return n;
}

}  // extern "C"
