// Native ID transformer: unbounded global id -> bounded cache slot with LRU
// eviction. The TPU-native replacement for torchrec_dynamic_embedding's C++
// IDTransformer (reference role: dynamic_embedding/wrappers.py:24-306 binds
// IDTransformerGroup.transform).
//
// Design: open-addressing hash table (linear probing, power-of-two capacity)
// mapping int64 global ids to int32 slots, plus an intrusive doubly-linked
// LRU list over slots. The batch transform is one C call per feature tensor;
// evictions are reported back so the host runner can spill embedding rows to
// the parameter server before the slot is reused.
//
// C ABI (ctypes-friendly), no dependencies beyond libc.

#include <cstdint>
#include <cstdlib>
#include <cstring>

namespace {

struct Transformer {
  int64_t capacity;      // number of cache slots
  int64_t table_size;    // hash table size (power of two, > capacity)
  int64_t size;          // currently occupied slots
  int64_t* keys;         // [table_size] global id or EMPTY
  int32_t* slot_of;      // [table_size] slot for key at this bucket
  int64_t* key_of_slot;  // [capacity] global id stored in slot
  // LRU list over slots: head = most recent, tail = least recent
  int32_t* prev;         // [capacity]
  int32_t* next;         // [capacity]
  int32_t head;
  int32_t tail;
  int64_t hits;
  int64_t misses;
  int64_t evictions;
};

constexpr int64_t EMPTY = INT64_MIN;

inline uint64_t hash64(uint64_t x) {
  x ^= x >> 33;
  x *= 0xff51afd7ed558ccdULL;
  x ^= x >> 33;
  x *= 0xc4ceb9fe1a85ec53ULL;
  x ^= x >> 33;
  return x;
}

inline int64_t find_bucket(const Transformer* t, int64_t key) {
  uint64_t mask = (uint64_t)t->table_size - 1;
  uint64_t b = hash64((uint64_t)key) & mask;
  while (t->keys[b] != EMPTY && t->keys[b] != key) {
    b = (b + 1) & mask;
  }
  return (int64_t)b;
}

inline void lru_unlink(Transformer* t, int32_t s) {
  if (t->prev[s] >= 0) t->next[t->prev[s]] = t->next[s];
  else t->head = t->next[s];
  if (t->next[s] >= 0) t->prev[t->next[s]] = t->prev[s];
  else t->tail = t->prev[s];
  t->prev[s] = t->next[s] = -1;
}

inline void lru_push_front(Transformer* t, int32_t s) {
  t->prev[s] = -1;
  t->next[s] = t->head;
  if (t->head >= 0) t->prev[t->head] = s;
  t->head = s;
  if (t->tail < 0) t->tail = s;
}

// remove a key from the hash table with backward-shift deletion
void table_erase(Transformer* t, int64_t key) {
  uint64_t mask = (uint64_t)t->table_size - 1;
  int64_t b = find_bucket(t, key);
  if (t->keys[b] == EMPTY) return;
  t->keys[b] = EMPTY;
  uint64_t i = (uint64_t)b;
  uint64_t j = i;
  while (true) {
    j = (j + 1) & mask;
    if (t->keys[j] == EMPTY) break;
    uint64_t k = hash64((uint64_t)t->keys[j]) & mask;
    // can the element at j move to i?
    bool between = (i < j) ? (k <= i || k > j) : (k <= i && k > j);
    if (between) {
      t->keys[i] = t->keys[j];
      t->slot_of[i] = t->slot_of[j];
      t->keys[j] = EMPTY;
      i = j;
    }
  }
}

}  // namespace

extern "C" {

Transformer* idt_create(int64_t capacity) {
  if (capacity <= 0) return nullptr;
  int64_t ts = 1;
  while (ts < capacity * 2) ts <<= 1;
  Transformer* t = (Transformer*)std::calloc(1, sizeof(Transformer));
  t->capacity = capacity;
  t->table_size = ts;
  t->size = 0;
  t->keys = (int64_t*)std::malloc(sizeof(int64_t) * ts);
  t->slot_of = (int32_t*)std::malloc(sizeof(int32_t) * ts);
  t->key_of_slot = (int64_t*)std::malloc(sizeof(int64_t) * capacity);
  t->prev = (int32_t*)std::malloc(sizeof(int32_t) * capacity);
  t->next = (int32_t*)std::malloc(sizeof(int32_t) * capacity);
  for (int64_t i = 0; i < ts; ++i) t->keys[i] = EMPTY;
  for (int64_t i = 0; i < capacity; ++i) {
    t->key_of_slot[i] = EMPTY;
    t->prev[i] = t->next[i] = -1;
  }
  t->head = t->tail = -1;
  return t;
}

void idt_destroy(Transformer* t) {
  if (!t) return;
  std::free(t->keys);
  std::free(t->slot_of);
  std::free(t->key_of_slot);
  std::free(t->prev);
  std::free(t->next);
  std::free(t);
}

// Transform `n` global ids into cache slots (written to `slots_out`).
// Newly admitted (id, slot) pairs are appended to admitted_*; evicted
// (old_id, slot) pairs to evicted_* (arrays sized >= n by the caller).
// Returns the number of admissions (== number of valid entries in
// admitted_*); *n_evicted gets the eviction count. id 0 is padding and maps
// to slot 0 unconditionally (slot 0 is reserved, never evicted).
int64_t idt_transform(Transformer* t, const int64_t* ids, int64_t n,
                      int32_t* slots_out, int64_t* admitted_ids,
                      int32_t* admitted_slots, int64_t* evicted_ids,
                      int32_t* evicted_slots, int64_t* n_evicted) {
  int64_t n_adm = 0, n_ev = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t id = ids[i];
    if (id == 0) {  // padding
      slots_out[i] = 0;
      continue;
    }
    int64_t b = find_bucket(t, id);
    if (t->keys[b] == id) {  // hit
      int32_t s = t->slot_of[b];
      lru_unlink(t, s);
      lru_push_front(t, s);
      slots_out[i] = s;
      t->hits++;
      continue;
    }
    t->misses++;
    int32_t s;
    if (t->size + 1 < t->capacity) {  // slot 0 reserved for padding
      s = (int32_t)(++t->size);      // slots 1..capacity-1
      if (s >= t->capacity) { s = (int32_t)(t->capacity - 1); }
    } else {  // evict LRU
      s = t->tail;
      if (s <= 0) s = t->tail = t->head;  // degenerate tiny capacity
      int64_t old = t->key_of_slot[s];
      lru_unlink(t, s);
      table_erase(t, old);
      evicted_ids[n_ev] = old;
      evicted_slots[n_ev] = s;
      n_ev++;
      t->evictions++;
      b = find_bucket(t, id);  // buckets shifted by erase
    }
    t->keys[b] = id;
    t->slot_of[b] = s;
    t->key_of_slot[s] = id;
    lru_push_front(t, s);
    slots_out[i] = s;
    admitted_ids[n_adm] = id;
    admitted_slots[n_adm] = s;
    n_adm++;
  }
  *n_evicted = n_ev;
  return n_adm;
}

int64_t idt_size(const Transformer* t) { return t->size; }
int64_t idt_hits(const Transformer* t) { return t->hits; }
int64_t idt_misses(const Transformer* t) { return t->misses; }
int64_t idt_evictions(const Transformer* t) { return t->evictions; }

// Dump current (id, slot) pairs for checkpointing. Returns count written.
int64_t idt_dump(const Transformer* t, int64_t* ids_out, int32_t* slots_out,
                 int64_t max_n) {
  int64_t n = 0;
  for (int64_t s = 1; s < t->capacity && n < max_n; ++s) {
    if (t->key_of_slot[s] != EMPTY) {
      ids_out[n] = t->key_of_slot[s];
      slots_out[n] = (int32_t)s;
      n++;
    }
  }
  return n;
}

// Restore (id, slot) pairs (checkpoint load). Caller guarantees slots are
// unique and < capacity.
void idt_restore(Transformer* t, const int64_t* ids, const int32_t* slots,
                 int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    int64_t b = find_bucket(t, ids[i]);
    t->keys[b] = ids[i];
    t->slot_of[b] = slots[i];
    t->key_of_slot[slots[i]] = ids[i];
    if (t->prev[slots[i]] == -1 && t->next[slots[i]] == -1 &&
        t->head != slots[i]) {
      lru_push_front(t, slots[i]);
    }
    if (slots[i] > t->size) t->size = slots[i];
  }
}

}  // extern "C"
