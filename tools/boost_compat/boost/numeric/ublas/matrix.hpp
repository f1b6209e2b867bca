// Minimal row-major boost::numeric::ublas::matrix + prod(), covering the
// 2x2 * 2x4 rotation use in the reference devkit's toPolygon().
#ifndef BOOST_COMPAT_UBLAS_MATRIX_HPP
#define BOOST_COMPAT_UBLAS_MATRIX_HPP

#include <cstddef>
#include <vector>

namespace boost {
namespace numeric {
namespace ublas {

template <typename T>
class matrix {
 public:
  matrix(std::size_t rows, std::size_t cols)
      : rows_(rows), cols_(cols), data_(rows * cols, T()) {}
  T &operator()(std::size_t i, std::size_t j) { return data_[i * cols_ + j]; }
  const T &operator()(std::size_t i, std::size_t j) const {
    return data_[i * cols_ + j];
  }
  std::size_t size1() const { return rows_; }
  std::size_t size2() const { return cols_; }
  std::vector<T> &data() { return data_; }
  const std::vector<T> &data() const { return data_; }

 private:
  std::size_t rows_, cols_;
  std::vector<T> data_;
};

template <typename T>
inline matrix<T> prod(const matrix<T> &a, const matrix<T> &b) {
  matrix<T> c(a.size1(), b.size2());
  for (std::size_t i = 0; i < a.size1(); ++i)
    for (std::size_t k = 0; k < a.size2(); ++k)
      for (std::size_t j = 0; j < b.size2(); ++j)
        c(i, j) += a(i, k) * b(k, j);
  return c;
}

}  // namespace ublas
}  // namespace numeric
}  // namespace boost

#endif  // BOOST_COMPAT_UBLAS_MATRIX_HPP
