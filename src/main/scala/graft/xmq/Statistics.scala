package graft.xmq

/** `statistics` command: count/size elements, text nodes, comments, cdata,
  * entities, attributes, quote histogram; emits a new stats document
  * (xmq-cli.c:2838-3050). */
object Statistics {

  final class Stats {
    var numElements = 0L; var sizeElementNames = 0L
    var numTextNodes = 0L; var sizeTextNodes = 0L
    var numAttributes = 0L; var sizeAttributeNames = 0L; var sizeAttributeContent = 0L
    var numComments = 0L; var sizeComments = 0L
    var numCdata = 0L; var sizeCdata = 0L
    var numEntities = 0L; var sizeEntities = 0L
    var sizeDoctype = 0L
    var withSq = 0L; var withDq = 0L; var withNoQ = 0L; var withAnyQ = 0L; var withBothQ = 0L
  }

  private def utf8Len(s: String): Long = s.getBytes("UTF-8").length.toLong

  def compute(doc: XDoc, sourceSize: Long): XDoc = {
    val st = new Stats
    def acc(n: XNode): Unit = n match {
      case e: XElem =>
        st.numElements += 1
        st.sizeElementNames += utf8Len(e.name)
        e.attrs.foreach { a =>
          st.numAttributes += 1
          st.sizeAttributeNames += utf8Len(a.key)
          if (a.values != null) a.values.foreach {
            case t: XText => st.sizeAttributeContent += utf8Len(t.content)
            case _ =>
          }
        }
        e.children.foreach(acc)
      case t: XText if t.cdata =>
        st.numCdata += 1
        st.sizeCdata += utf8Len(t.content)
      case t: XText =>
        st.numTextNodes += 1
        st.sizeTextNodes += utf8Len(t.content)
        val hasSq = t.content.contains('\'')
        val hasDq = t.content.contains('"')
        if (hasDq) st.withDq += 1
        if (hasSq) st.withSq += 1
        if (hasSq || hasDq) st.withAnyQ += 1 else st.withNoQ += 1
        if (hasSq && hasDq) st.withBothQ += 1
      case c: XComment =>
        st.numComments += 1
        st.sizeComments += utf8Len(c.content)
      case r: XEntityRef =>
        st.numEntities += 1
        st.sizeEntities += utf8Len(r.name)
      case d: XDoctype =>
        st.sizeDoctype += utf8Len(d.name)
      case _ =>
    }
    doc.children.foreach(acc)

    val out = new XDoc
    val root = new XElem("statistics")
    out.appendChild(root)
    def kv(key: String, v: Long): Unit = {
      val e = new XElem(key)
      e.appendChild(new XText(v.toString))
      root.appendChild(e)
    }
    kv("size_source", sourceSize)
    if (st.numElements > 0) kv("num_elements", st.numElements)
    if (st.sizeElementNames > 0) kv("size_element_names", st.sizeElementNames)
    if (st.numTextNodes > 0) kv("num_text_nodes", st.numTextNodes)
    if (st.sizeTextNodes > 0) kv("size_text_nodes", st.sizeTextNodes)
    if (st.numAttributes > 0) kv("num_attributes", st.numAttributes)
    if (st.sizeAttributeNames > 0) kv("size_attribute_names", st.sizeAttributeNames)
    if (st.sizeAttributeContent > 0) kv("size_attribute_content", st.sizeAttributeContent)
    if (st.numComments > 0) kv("num_comments", st.numComments)
    if (st.sizeComments > 0) kv("size_comments", st.sizeComments)
    if (st.sizeDoctype > 0) kv("size_doctype", st.sizeDoctype)
    if (st.numCdata > 0) kv("num_cdata_nodes", st.numCdata)
    if (st.sizeCdata > 0) kv("size_cdata_nodes", st.sizeCdata)
    if (st.withSq > 0) kv("num_text_nodes_with_single_quotes", st.withSq)
    if (st.withDq > 0) kv("num_text_nodes_with_double_quotes", st.withDq)
    if (st.withNoQ > 0) kv("num_text_nodes_with_no_quotes", st.withNoQ)
    if (st.withAnyQ > 0) kv("num_text_nodes_with_any_quotes", st.withAnyQ)
    if (st.withBothQ > 0) kv("num_text_nodes_with_both_quotes", st.withBothQ)
    kv("sum_meta", st.sizeElementNames + st.sizeAttributeNames + st.sizeAttributeContent + st.sizeDoctype)
    kv("sum_text", st.sizeTextNodes)
    out
  }
}
