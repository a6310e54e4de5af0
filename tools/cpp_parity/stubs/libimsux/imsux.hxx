// Minimal clean-room stand-in for the reference's in-house utility
// header (github.com/arloan/libimsux, not installed on this host).
// Implements ONLY the interface surface the reference headers consume:
// scoped_ptr / scoped_ob / file_dtor / array_dtor, stop_watch, comma_sep,
// xs, errno_error, and the CRITICAL_SECTION locking trio.  Written from
// the call sites in /root/reference/OpticalImageProcessor/{imageop.h,
// preproc.h,stitcher.h,aux_separator.h}; no reference code copied.
#ifndef OIP_PARITY_IMSUX_STUB
#define OIP_PARITY_IMSUX_STUB

#include <chrono>
#include <cstdarg>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <stdexcept>
#include <string>

#define IMSUX_USE_NS

struct file_dtor {
    void operator()(FILE * f) const { if (f) fclose(f); }
};

template <typename T>
struct array_dtor {
    void operator()(T * p) const { delete[] p; }
};

template <typename T>
struct default_array_dtor {  // every default-deleted scoped_ptr in the
    void operator()(T * p) const { delete[] p; }  // codebase holds new[]
};

template <typename T, typename Dtor = default_array_dtor<T>>
class scoped_ptr {
public:
    scoped_ptr() : p_(nullptr), d_() {}
    scoped_ptr(T * p) : p_(p), d_() {}
    // stateful-deleter form: aux_separator.h holds an mmap'ed region as
    // scoped_ptr<uint8_t, MMapDtor>(ptr, size) where MMapDtor(size_t)
    scoped_ptr(T * p, Dtor d) : p_(p), d_(d) {}
    scoped_ptr(const scoped_ptr &) = delete;
    scoped_ptr & operator=(const scoped_ptr &) = delete;
    scoped_ptr(scoped_ptr && o) : p_(o.detach()), d_(o.d_) {}
    scoped_ptr & operator=(scoped_ptr && o) {
        attach(o.detach());
        d_ = o.d_;
        return *this;
    }
    scoped_ptr & operator=(T * p) {
        attach(p);
        return *this;
    }
    ~scoped_ptr() { reset_(); }

    operator T *() const { return p_; }
    T * operator->() const { return p_; }
    T & operator[](size_t i) const { return p_[i]; }
    T * get() const { return p_; }
    bool is_null() const { return p_ == nullptr; }
    void attach(T * p) {
        if (p != p_) reset_();
        p_ = p;
    }
    T * detach() {
        T * p = p_;
        p_ = nullptr;
        return p;
    }

private:
    void reset_() {
        if (p_) d_(p_);
        p_ = nullptr;
    }
    T * p_;
    Dtor d_;
};

// RAII holder for non-pointer resources (aux_separator.h wraps a POSIX fd
// as scoped_ob<int, FDDtor>); converts implicitly to the held value.
template <typename T, typename Dtor>
class scoped_ob {
public:
    scoped_ob(T v) : v_(v) {}
    scoped_ob(const scoped_ob &) = delete;
    scoped_ob & operator=(const scoped_ob &) = delete;
    ~scoped_ob() { Dtor()(v_); }
    operator T() const { return v_; }
    T get() const { return v_; }

private:
    T v_;
};

// Win32-flavoured critical-section API over std::mutex, as consumed by
// aux_separator.h: the locker object binds a CS once, each _ims_lock
// block acquires/releases it for the block's extent.
typedef std::mutex CRITICAL_SECTION;
inline void InitializeCriticalSection(CRITICAL_SECTION *) {}

class CriticalSectionLocker {
public:
    explicit CriticalSectionLocker(CRITICAL_SECTION & cs) : cs_(cs) {}
    CRITICAL_SECTION & cs_;
};

struct ims_lock_scope {
    explicit ims_lock_scope(CriticalSectionLocker & l) : l_(l), done(false) {
        l_.cs_.lock();
    }
    ~ims_lock_scope() { l_.cs_.unlock(); }
    CriticalSectionLocker & l_;
    bool done;
};
#define _ims_lock(Type, locker) \
    for (ims_lock_scope _ims_g(locker); !_ims_g.done; _ims_g.done = true)

class stop_watch {
public:
    struct lap {
        double ellapsed;
    };
    stop_watch() : t0_(clock_::now()) {}
    lap tick() const {
        return lap{std::chrono::duration<double>(clock_::now() - t0_)
                       .count()};
    }
    static void rst() { global_() = clock_::now(); }
    static lap tik() {
        return lap{
            std::chrono::duration<double>(clock_::now() - global_()).count()};
    }

private:
    typedef std::chrono::steady_clock clock_;
    static clock_::time_point & global_() {
        static clock_::time_point t = clock_::now();
        return t;
    }
    clock_::time_point t0_;
};

// printf-able value formatter; the reference only ever prints
// comma_sep(v).sep() with %s — digit grouping is cosmetic, plain
// formatting suffices for the parity harness.
class comma_sep {
public:
    explicit comma_sep(double v) { snprintf(buf_, sizeof buf_, "%.3f", v); }
    explicit comma_sep(float v) { snprintf(buf_, sizeof buf_, "%.3f", v); }
    explicit comma_sep(long long v) {
        snprintf(buf_, sizeof buf_, "%lld", v);
    }
    explicit comma_sep(unsigned long long v) {
        snprintf(buf_, sizeof buf_, "%llu", v);
    }
    explicit comma_sep(long v) { snprintf(buf_, sizeof buf_, "%ld", v); }
    explicit comma_sep(unsigned long v) {
        snprintf(buf_, sizeof buf_, "%lu", v);
    }
    explicit comma_sep(int v) { snprintf(buf_, sizeof buf_, "%d", v); }
    explicit comma_sep(unsigned v) { snprintf(buf_, sizeof buf_, "%u", v); }
    const char * sep() const { return buf_; }

private:
    char buf_[64];
};

// printf-style formatted string with a public char-array member `s`
struct xs {
    char s[4096];
    xs(const char * fmt, ...) {
        va_list ap;
        va_start(ap, fmt);
        vsnprintf(s, sizeof s, fmt, ap);
        va_end(ap);
    }
    operator std::string() const { return std::string(s); }
    operator const char *() const { return s; }
};

class errno_error : public std::runtime_error {
public:
    explicit errno_error(const std::string & what)
        : std::runtime_error(what + ": " + std::to_string(errno)) {}
};

#endif  // OIP_PARITY_IMSUX_STUB
