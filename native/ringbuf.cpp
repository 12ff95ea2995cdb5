// Lock-free SPSC float ring buffer + frame chunker for the streaming host path.
//
// TPU-native replacement for the reference's crossbeam ArrayQueue pair +
// worker-thread frame assembly (obs-rvc/src/lib.rs:137-145, 797-857): the
// real-time audio callback pushes arbitrary-size frames on one thread; the
// inference loop pops fixed sample_frame_size chunks on another, with no
// locks on either side. Single-producer/single-consumer, power-of-two
// capacity, acquire/release atomics.
//
// Exposed as a C ABI for ctypes (obs_rvc_tpu/stream/ringbuf.py).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <new>

namespace {

struct RingBuf {
    float* data;
    uint64_t capacity;  // power of two
    uint64_t mask;
    alignas(64) std::atomic<uint64_t> head;  // write index (producer)
    alignas(64) std::atomic<uint64_t> tail;  // read index (consumer)
};

uint64_t next_pow2(uint64_t x) {
    uint64_t p = 1;
    while (p < x) p <<= 1;
    return p;
}

}  // namespace

extern "C" {

RingBuf* rvc_ringbuf_create(uint64_t min_capacity) {
    auto* rb = new (std::nothrow) RingBuf();
    if (!rb) return nullptr;
    rb->capacity = next_pow2(min_capacity);
    rb->mask = rb->capacity - 1;
    rb->data = new (std::nothrow) float[rb->capacity];
    if (!rb->data) {
        delete rb;
        return nullptr;
    }
    rb->head.store(0, std::memory_order_relaxed);
    rb->tail.store(0, std::memory_order_relaxed);
    return rb;
}

void rvc_ringbuf_destroy(RingBuf* rb) {
    if (!rb) return;
    delete[] rb->data;
    delete rb;
}

uint64_t rvc_ringbuf_capacity(const RingBuf* rb) { return rb->capacity; }

uint64_t rvc_ringbuf_available(const RingBuf* rb) {
    return rb->head.load(std::memory_order_acquire) -
           rb->tail.load(std::memory_order_acquire);
}

uint64_t rvc_ringbuf_free_space(const RingBuf* rb) {
    return rb->capacity - rvc_ringbuf_available(rb);
}

// Push up to n samples; returns samples written (may be < n when full —
// caller decides whether to drop, mirroring ArrayQueue::force_push policy
// at the frame level).
uint64_t rvc_ringbuf_push(RingBuf* rb, const float* src, uint64_t n) {
    uint64_t head = rb->head.load(std::memory_order_relaxed);
    uint64_t tail = rb->tail.load(std::memory_order_acquire);
    uint64_t space = rb->capacity - (head - tail);
    if (n > space) n = space;
    for (uint64_t i = 0; i < n; ++i) rb->data[(head + i) & rb->mask] = src[i];
    rb->head.store(head + n, std::memory_order_release);
    return n;
}

// Pop exactly n samples if available, else pop nothing. Returns n or 0.
// (The chunker contract: the consumer only acts on full chunks,
// lib.rs:819-828.)
uint64_t rvc_ringbuf_pop_exact(RingBuf* rb, float* dst, uint64_t n) {
    uint64_t tail = rb->tail.load(std::memory_order_relaxed);
    uint64_t head = rb->head.load(std::memory_order_acquire);
    if (head - tail < n) return 0;
    for (uint64_t i = 0; i < n; ++i) dst[i] = rb->data[(tail + i) & rb->mask];
    rb->tail.store(tail + n, std::memory_order_release);
    return n;
}

// Pop up to n samples; returns samples read.
uint64_t rvc_ringbuf_pop(RingBuf* rb, float* dst, uint64_t n) {
    uint64_t tail = rb->tail.load(std::memory_order_relaxed);
    uint64_t head = rb->head.load(std::memory_order_acquire);
    uint64_t avail = head - tail;
    if (n > avail) n = avail;
    for (uint64_t i = 0; i < n; ++i) dst[i] = rb->data[(tail + i) & rb->mask];
    rb->tail.store(tail + n, std::memory_order_release);
    return n;
}

// Drop the oldest n samples (overrun handling).
uint64_t rvc_ringbuf_discard(RingBuf* rb, uint64_t n) {
    uint64_t tail = rb->tail.load(std::memory_order_relaxed);
    uint64_t head = rb->head.load(std::memory_order_acquire);
    uint64_t avail = head - tail;
    if (n > avail) n = avail;
    rb->tail.store(tail + n, std::memory_order_release);
    return n;
}

}  // extern "C"
