// Minimal clean-room NumCpp stand-in (NumCpp is not installed on this
// host).  Implements only what the reference's preproc.h consumes:
//   - nc::NdArray<T>: non-owning view ctor, (Slice, Slice) rectangle
//     copy, astype<U>(), data(), operator[]
//   - nc::Slice
//   - nc::polynomial::Poly1d<double>::fit(x, y, order).coefficients()
// The fit is ordinary polynomial least squares (normal equations in
// long double, coefficients in ascending order) — equivalent to
// NumCpp's Poly1d::fit for the tiny, well-conditioned systems here
// (<=50 samples, order <= 2); the parity gate on the fitted shift
// curves is 2e-3 px, far above any solver-order difference.
#ifndef OIP_PARITY_NUMCPP_STUB
#define OIP_PARITY_NUMCPP_STUB

#include <cmath>
#include <cstddef>
#include <stdexcept>
#include <utility>
#include <vector>

namespace nc {

struct Slice {
    int start;
    int stop;
    Slice(int a, int b) : start(a), stop(b) {}
};

template <typename T>
class NdArray {
public:
    NdArray() : rows_(0), cols_(0), view_(nullptr) {}
    // non-owning view over row-major (rows, cols) data; the reference
    // always passes takeOwnership=false
    NdArray(const T * data, int rows, int cols, bool takeOwnership) :
        rows_(rows), cols_(cols), view_(data) {
        if (takeOwnership)
            throw std::logic_error("NdArray stub: owning ctor unsupported");
    }
    NdArray(int rows, int cols) :
        rows_(rows), cols_(cols), view_(nullptr),
        store_((size_t)rows * cols) {}

    NdArray operator()(const Slice & r, const Slice & c) const {
        NdArray out(r.stop - r.start, c.stop - c.start);
        const T * src = ptr_();
        for (int y = r.start; y < r.stop; ++y)
            for (int x = c.start; x < c.stop; ++x)
                out.store_[(size_t)(y - r.start) * out.cols_ +
                           (x - c.start)] = src[(size_t)y * cols_ + x];
        return out;
    }

    template <typename U>
    NdArray<U> astype() const {
        NdArray<U> out(rows_, cols_);
        const T * src = ptr_();
        U * dst = out.data();
        for (size_t i = 0; i < (size_t)rows_ * cols_; ++i)
            dst[i] = static_cast<U>(src[i]);
        return out;
    }

    T * data() { return store_.empty() ? const_cast<T *>(view_)
                                       : store_.data(); }
    const T * data() const { return ptr_(); }
    T operator[](size_t i) const { return ptr_()[i]; }
    int numRows() const { return rows_; }
    int numCols() const { return cols_; }
    size_t size() const { return (size_t)rows_ * cols_; }

private:
    const T * ptr_() const {
        return store_.empty() ? view_ : store_.data();
    }
    int rows_, cols_;
    const T * view_;
    std::vector<T> store_;

    template <typename U>
    friend class NdArray;
};

namespace polynomial {

template <typename T>
class Poly1d {
public:
    static Poly1d fit(const NdArray<T> & xv, const NdArray<T> & yv,
                      int order) {
        const size_t n = xv.size();
        if (yv.size() != n)
            throw std::invalid_argument("Poly1d stub: size mismatch");
        const int m = order + 1;
        // normal equations sum x^(i+j) in long double
        std::vector<long double> ata((size_t)m * m, 0.0L), atb(m, 0.0L);
        for (size_t k = 0; k < n; ++k) {
            long double x = (long double)xv[k];
            long double y = (long double)yv[k];
            std::vector<long double> pw(m);
            pw[0] = 1.0L;
            for (int i = 1; i < m; ++i) pw[i] = pw[i - 1] * x;
            for (int i = 0; i < m; ++i) {
                atb[i] += pw[i] * y;
                for (int j = 0; j < m; ++j) ata[(size_t)i * m + j] += pw[i] * pw[j];
            }
        }
        // gaussian elimination with partial pivoting
        for (int c = 0; c < m; ++c) {
            int piv = c;
            for (int r = c + 1; r < m; ++r)
                if (fabsl(ata[(size_t)r * m + c]) >
                    fabsl(ata[(size_t)piv * m + c]))
                    piv = r;
            if (piv != c) {
                for (int j = 0; j < m; ++j)
                    std::swap(ata[(size_t)c * m + j],
                              ata[(size_t)piv * m + j]);
                std::swap(atb[c], atb[piv]);
            }
            long double d = ata[(size_t)c * m + c];
            if (d == 0.0L)
                throw std::runtime_error("Poly1d stub: singular system");
            for (int r = 0; r < m; ++r) {
                if (r == c) continue;
                long double f = ata[(size_t)r * m + c] / d;
                for (int j = c; j < m; ++j)
                    ata[(size_t)r * m + j] -= f * ata[(size_t)c * m + j];
                atb[r] -= f * atb[c];
            }
        }
        Poly1d out;
        out.coeffs_ = NdArray<T>(1, m);
        for (int i = 0; i < m; ++i)
            out.coeffs_.data()[i] =
                (T)(atb[i] / ata[(size_t)i * m + i]);
        return out;
    }

    NdArray<T> coefficients() const { return coeffs_; }

private:
    NdArray<T> coeffs_;
};

}  // namespace polynomial
}  // namespace nc

#endif  // OIP_PARITY_NUMCPP_STUB
